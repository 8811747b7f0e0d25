// Standalone driver for the reference C++ monolithic renderer
// (path_tracer_lib/core/renderer.cpp), used ONLY to *measure* the reference
// baseline throughput on CPU (paths/s) so bench.py's vs_baseline is a
// measured number rather than an estimate. Compiled against the read-only
// reference checkout; nothing here is copied from it.
//
// Usage: ref_bench <scene.gltf> <width> <height> <samples> <bounces>
// Prints one line: ref_paths_per_sec=<N>

#include "path_tracer/core/renderer.hpp"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>

int main(int argc, char** argv) {
    if (argc < 6) {
        std::fprintf(stderr,
                     "usage: %s scene.gltf W H samples bounces [threads]\n",
                     argv[0]);
        return 2;
    }
    const std::string scene = argv[1];
    const uint32_t w = std::atoi(argv[2]);
    const uint32_t h = std::atoi(argv[3]);
    const uint32_t samples = std::atoi(argv[4]);
    const uint32_t bounces = std::atoi(argv[5]);
    const uint32_t threads = argc > 6 ? std::atoi(argv[6]) : 0;

    core::renderer r;
    r.resolution = math::uvec2(w, h);
    r.sample_count = samples;
    r.bounce_count = static_cast<uint8_t>(bounces);
    r.thread_count = threads;
    r.load_gltf(scene);

    const auto t0 = std::chrono::steady_clock::now();
    auto png = r.render();
    const auto t1 = std::chrono::steady_clock::now();
    const double dt = std::chrono::duration<double>(t1 - t0).count();
    const double paths = double(w) * h * samples;
    std::printf("ref_paths_per_sec=%.1f elapsed_s=%.3f png_bytes=%zu\n",
                paths / dt, dt, png.size());
    return 0;
}
