// Implementation TU for the header-only third-party libs the reference
// vendors (its CMake build defines these inside the AWS Lambda image; the
// standalone bench build needs them in exactly one TU).
#define CGLTF_IMPLEMENTATION
#include <cgltf/custom_cgltf.h>

#define STB_IMAGE_IMPLEMENTATION
#include <stb/stb_image.h>

#define STB_IMAGE_WRITE_IMPLEMENTATION
#include <stb/stb_image_write.h>
