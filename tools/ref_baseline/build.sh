#!/bin/sh
# Build the reference-renderer bench driver against the read-only reference
# checkout. Produces ./ref_bench in this directory.
set -e
REF=${REF:-/root/reference/path-tracer-core}
HERE=$(dirname "$0")
g++ -std=c++20 -O2 -w \
    -I"$REF/path_tracer_lib" \
    -I"$REF/path_tracer_lib/path_tracer" \
    -I"$REF/third_party/cgltf/include" \
    -I"$REF/third_party/stb/include" \
    "$HERE/driver.cpp" "$HERE/impls.cpp" \
    "$REF"/path_tracer_lib/path_tracer/*/*.cpp \
    -lpthread -o "$HERE/ref_bench"
echo "built $HERE/ref_bench"
