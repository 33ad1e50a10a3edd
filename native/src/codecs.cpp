// Native image codecs: libpng/libjpeg + minimal BMP/TGA readers.
//
// Counterpart of the reference's stb-backed layer
// (/root/reference/src/image.cpp:11-35) with the same contract: decoded
// images keep their file-native channel count, restricted to {1,3,4};
// saving is PNG-only. Independent implementation on the system codecs.

#include "codecs.hpp"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#ifdef DLIMG_HAVE_LIBPNG
#include <png.h>
#endif
#ifdef DLIMG_HAVE_LIBJPEG
#include <csetjmp>
#include <jpeglib.h>
#endif

namespace dlimg_native {
namespace {

struct File {
    std::FILE* f = nullptr;
    explicit File(char const* path, char const* mode)
        : f(std::fopen(path, mode)) {}
    ~File() {
        if (f) std::fclose(f);
    }
    File(File const&) = delete;
    File& operator=(File const&) = delete;
};

// ---------------------------------------------------------------------------
// PNG (libpng)
// ---------------------------------------------------------------------------

#ifdef DLIMG_HAVE_LIBPNG

uint8_t* load_png(std::FILE* f, int* w, int* h, int* channels,
                  std::string* error) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    // Locals written between setjmp and a potential longjmp must be
    // volatile (C11 7.13.2.1 — non-volatile values are indeterminate after
    // the jump) and must not have destructors (longjmp skips them), hence
    // malloc'd row pointers instead of a std::vector.
    uint8_t* volatile out = nullptr;
    png_bytep* volatile rows = nullptr;
    if (!png || !info) {
        *error = "libpng: allocation failed";
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    if (setjmp(png_jmpbuf(png))) {  // libpng error path
        *error = "libpng: decode failed";
        std::free(rows);
        std::free(out);
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    png_init_io(png, f);
    png_read_info(png, info);

    // Normalise to 8-bit {gray, rgb, rgba} keeping the native channel count
    // (palette -> rgb(a), gray+alpha -> rgba like stb's 2->4 promotion is
    // NOT done: gray+alpha stays 2ch in stb; the reference rejects 2ch, so
    // promote GA to RGBA to stay within the {1,3,4} contract).
    png_set_strip_16(png);
    png_set_packing(png);
    png_byte const ct = png_get_color_type(png, info);
    if (ct == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (ct == PNG_COLOR_TYPE_GRAY && png_get_bit_depth(png, info) < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    // GRAY + tRNS becomes gray+alpha (2ch) after tRNS_to_alpha — promote it
    // to RGBA exactly like GRAY_ALPHA so the {1,3,4} contract holds.
    if (ct == PNG_COLOR_TYPE_GRAY_ALPHA ||
        (ct == PNG_COLOR_TYPE_GRAY &&
         png_get_valid(png, info, PNG_INFO_tRNS)))
        png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    *w = int(png_get_image_width(png, info));
    *h = int(png_get_image_height(png, info));
    *channels = int(png_get_channels(png, info));
    size_t rowbytes = png_get_rowbytes(png, info);
    out = static_cast<uint8_t*>(std::malloc(rowbytes * *h));
    rows = static_cast<png_bytep*>(std::malloc(sizeof(png_bytep) * *h));
    if (!out || !rows) {
        *error = "libpng: allocation failed";
        std::free(rows);
        std::free(out);
        png_destroy_read_struct(&png, &info, nullptr);
        return nullptr;
    }
    for (int y = 0; y < *h; ++y) rows[y] = out + size_t(y) * rowbytes;
    png_read_image(png, rows);
    png_read_end(png, nullptr);
    std::free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
}

#endif  // DLIMG_HAVE_LIBPNG

// ---------------------------------------------------------------------------
// JPEG (libjpeg)
// ---------------------------------------------------------------------------

#ifdef DLIMG_HAVE_LIBJPEG

struct JpegError {
    jpeg_error_mgr mgr;
    std::jmp_buf jmp;
};

void jpeg_error_exit(j_common_ptr cinfo) {
    std::longjmp(reinterpret_cast<JpegError*>(cinfo->err)->jmp, 1);
}

uint8_t* load_jpeg(std::FILE* f, int* w, int* h, int* channels,
                   std::string* error) {
    jpeg_decompress_struct cinfo;
    JpegError jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_error_exit;
    // volatile: written between setjmp and a potential longjmp (see
    // load_png). No destructor-bearing locals in that window either.
    uint8_t* volatile out = nullptr;
    uint8_t* volatile crow = nullptr;
    if (setjmp(jerr.jmp)) {
        *error = "libjpeg: decode failed";
        std::free(crow);
        std::free(out);
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    // CMYK / Adobe YCCK: libjpeg cannot convert these to RGB itself (its
    // default would hand back 4-component CMYK that downstream code would
    // misread as RGBA). Ask for CMYK (YCCK -> CMYK is supported) and
    // convert manually below, stb-style: Adobe files store the components
    // inverted, so r = c*k/255 etc.
    bool const cmyk = cinfo.jpeg_color_space == JCS_CMYK ||
                      cinfo.jpeg_color_space == JCS_YCCK;
    if (cmyk) cinfo.out_color_space = JCS_CMYK;
    jpeg_start_decompress(&cinfo);
    *w = int(cinfo.output_width);
    *h = int(cinfo.output_height);
    *channels = cmyk ? 3 : int(cinfo.output_components);  // 1 (gray) / 3
    size_t rowbytes = size_t(*w) * *channels;
    out = static_cast<uint8_t*>(std::malloc(rowbytes * *h));
    if (cmyk)
        crow = static_cast<uint8_t*>(std::malloc(size_t(*w) * 4));
    if (!out || (cmyk && !crow)) {
        *error = "libjpeg: allocation failed";
        std::free(crow);
        std::free(out);
        jpeg_destroy_decompress(&cinfo);
        return nullptr;
    }
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* dst = out + size_t(cinfo.output_scanline) * rowbytes;
        if (cmyk) {
            JSAMPROW row = crow;
            jpeg_read_scanlines(&cinfo, &row, 1);
            for (int x = 0; x < *w; ++x) {
                uint8_t const* s = crow + size_t(x) * 4;
                unsigned k = s[3];
                dst[size_t(x) * 3 + 0] = uint8_t((s[0] * k + 127) / 255);
                dst[size_t(x) * 3 + 1] = uint8_t((s[1] * k + 127) / 255);
                dst[size_t(x) * 3 + 2] = uint8_t((s[2] * k + 127) / 255);
            }
        } else {
            JSAMPROW row = dst;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::free(crow);
    return out;
}

#endif  // DLIMG_HAVE_LIBJPEG

// ---------------------------------------------------------------------------
// BMP (built-in: uncompressed BI_RGB 8/24/32-bit, the format stb supports
// most commonly; compressed variants fall back to the bridge)
// ---------------------------------------------------------------------------

uint32_t rd32(uint8_t const* p) {
    return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 |
           uint32_t(p[3]) << 24;
}
uint16_t rd16(uint8_t const* p) { return uint16_t(p[0] | (p[1] << 8)); }

uint8_t* load_bmp(std::FILE* f, int* w, int* h, int* channels,
                  std::string* error) {
    uint8_t hdr[54];
    if (std::fread(hdr, 1, 54, f) != 54 || hdr[0] != 'B' || hdr[1] != 'M') {
        *error = "bmp: bad header";
        return nullptr;
    }
    uint32_t data_off = rd32(hdr + 10);
    uint32_t dib = rd32(hdr + 14);
    int32_t width = int32_t(rd32(hdr + 18));
    int32_t height = int32_t(rd32(hdr + 22));
    uint16_t bpp = rd16(hdr + 28);
    uint32_t compression = rd32(hdr + 30);
    bool flip = height > 0;  // bottom-up when positive
    height = height < 0 ? -height : height;
    if (dib < 40 || compression != 0 || width <= 0 || height <= 0 ||
        (bpp != 8 && bpp != 24 && bpp != 32)) {
        error->clear();  // not handled natively -> bridge fallback
        return nullptr;
    }
    // 8-bit: palette of (data_off - 54 - ...) entries; treat as grayscale
    // only when the palette is the identity gray ramp, else fall back.
    std::vector<uint8_t> palette;
    if (bpp == 8) {
        // data_off < header+dib would wrap the unsigned subtraction to ~4 GB
        // (crafted/corrupt files); a palette can be at most 256 BGRA
        // entries — anything bigger is malformed, not a gray ramp.
        if (data_off < 14 + dib || data_off - 14 - dib > 256 * 4) {
            error->clear();  // malformed/exotic -> bridge fallback
            return nullptr;
        }
        uint32_t pal_bytes = data_off - 14 - dib;
        palette.resize(pal_bytes);
        if (std::fseek(f, long(14 + dib), SEEK_SET) != 0 ||
            std::fread(palette.data(), 1, pal_bytes, f) != pal_bytes) {
            *error = "bmp: truncated palette";
            return nullptr;
        }
        for (size_t i = 0; i * 4 + 2 < palette.size(); ++i) {
            if (palette[i * 4] != i || palette[i * 4 + 1] != i ||
                palette[i * 4 + 2] != i) {
                error->clear();  // colour palette -> bridge
                return nullptr;
            }
        }
    }
    int c = bpp == 8 ? 1 : (bpp == 24 ? 3 : 4);
    size_t src_row = (size_t(width) * (bpp / 8) + 3) & ~size_t(3);
    size_t dst_row = size_t(width) * c;
    uint8_t* out = static_cast<uint8_t*>(std::malloc(dst_row * height));
    std::vector<uint8_t> row(src_row);
    if (!out || std::fseek(f, long(data_off), SEEK_SET) != 0) {
        std::free(out);
        *error = "bmp: seek/alloc failed";
        return nullptr;
    }
    for (int y = 0; y < height; ++y) {
        if (std::fread(row.data(), 1, src_row, f) != src_row) {
            std::free(out);
            *error = "bmp: truncated pixel data";
            return nullptr;
        }
        uint8_t* dst = out + size_t(flip ? height - 1 - y : y) * dst_row;
        for (int x = 0; x < width; ++x) {
            uint8_t const* s = row.data() + size_t(x) * (bpp / 8);
            if (c == 1) {
                dst[x] = s[0];
            } else {  // BMP stores BGR(A)
                dst[size_t(x) * c + 0] = s[2];
                dst[size_t(x) * c + 1] = s[1];
                dst[size_t(x) * c + 2] = s[0];
                if (c == 4) dst[size_t(x) * c + 3] = s[3];
            }
        }
    }
    *w = width;
    *h = height;
    *channels = c;
    return out;
}

// ---------------------------------------------------------------------------
// TGA (built-in: uncompressed + RLE, 8/24/32-bit — the whole practical set)
// ---------------------------------------------------------------------------

uint8_t* load_tga(std::FILE* f, int* w, int* h, int* channels,
                  std::string* error) {
    uint8_t hdr[18];
    if (std::fread(hdr, 1, 18, f) != 18) {
        *error = "tga: bad header";
        return nullptr;
    }
    uint8_t id_len = hdr[0], cmap_type = hdr[1], img_type = hdr[2];
    int width = rd16(hdr + 12), height = rd16(hdr + 14);
    uint8_t bpp = hdr[16], desc = hdr[17];
    bool rle = img_type == 10 || img_type == 11;
    bool gray = img_type == 3 || img_type == 11;
    bool truecolor = img_type == 2 || img_type == 10;
    if (cmap_type != 0 || (!gray && !truecolor) || width <= 0 || height <= 0 ||
        (gray && bpp != 8) || (truecolor && bpp != 24 && bpp != 32)) {
        error->clear();  // palette / exotic -> bridge fallback
        return nullptr;
    }
    if (id_len && std::fseek(f, id_len, SEEK_CUR) != 0) {
        *error = "tga: truncated id";
        return nullptr;
    }
    int c = bpp / 8;
    bool top_origin = (desc & 0x20) != 0;
    size_t n = size_t(width) * height;
    uint8_t* out = static_cast<uint8_t*>(std::malloc(n * c));
    if (!out) {
        *error = "tga: allocation failed";
        return nullptr;
    }
    auto put = [&](size_t i, uint8_t const* px) {
        uint8_t* d = out + i * c;
        if (c == 1) {
            d[0] = px[0];
        } else {  // TGA stores BGR(A)
            d[0] = px[2];
            d[1] = px[1];
            d[2] = px[0];
            if (c == 4) d[3] = px[3];
        }
    };
    uint8_t px[4];
    size_t i = 0;
    bool ok = true;
    if (!rle) {
        for (; i < n && ok; ++i) {
            ok = std::fread(px, 1, c, f) == size_t(c);
            if (ok) put(i, px);
        }
    } else {
        while (i < n && ok) {
            int ctrl = std::fgetc(f);
            if (ctrl == EOF) {
                ok = false;
                break;
            }
            int count = (ctrl & 0x7f) + 1;
            if (ctrl & 0x80) {  // run packet
                ok = std::fread(px, 1, c, f) == size_t(c);
                for (int k = 0; k < count && i < n && ok; ++k) put(i++, px);
            } else {  // raw packet
                for (int k = 0; k < count && i < n && ok; ++k) {
                    ok = std::fread(px, 1, c, f) == size_t(c);
                    if (ok) put(i++, px);
                }
            }
        }
    }
    if (!ok || i != n) {
        std::free(out);
        *error = "tga: truncated pixel data";
        return nullptr;
    }
    if (!top_origin) {  // bottom-up: flip rows in place
        size_t rowb = size_t(width) * c;
        std::vector<uint8_t> tmp(rowb);
        for (int y = 0; y < height / 2; ++y) {
            uint8_t* a = out + size_t(y) * rowb;
            uint8_t* b = out + size_t(height - 1 - y) * rowb;
            std::memcpy(tmp.data(), a, rowb);
            std::memcpy(a, b, rowb);
            std::memcpy(b, tmp.data(), rowb);
        }
    }
    *w = width;
    *h = height;
    *channels = c;
    return out;
}

}  // namespace

// ---------------------------------------------------------------------------
// Public entry points
// ---------------------------------------------------------------------------

bool available() {
#if defined(DLIMG_HAVE_LIBPNG) && defined(DLIMG_HAVE_LIBJPEG)
    return true;
#else
    return false;
#endif
}

uint8_t* load_image(char const* path, int* w, int* h, int* channels,
                    std::string* error) {
    error->clear();
    File file(path, "rb");
    if (!file.f) {
        *error = std::string("cannot open ") + path;
        return nullptr;
    }
    uint8_t magic[4] = {0, 0, 0, 0};
    size_t got = std::fread(magic, 1, 4, file.f);
    std::rewind(file.f);
    if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P' && magic[2] == 'N' &&
        magic[3] == 'G') {
#ifdef DLIMG_HAVE_LIBPNG
        uint8_t* out = load_png(file.f, w, h, channels, error);
#else
        uint8_t* out = nullptr;
        error->clear();
#endif
        if (out && *channels != 1 && *channels != 3 && *channels != 4) {
            *error = "unsupported number of channels";
            std::free(out);
            return nullptr;
        }
        return out;
    }
    if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
#ifdef DLIMG_HAVE_LIBJPEG
        return load_jpeg(file.f, w, h, channels, error);
#else
        error->clear();
        return nullptr;
#endif
    }
    if (got >= 2 && magic[0] == 'B' && magic[1] == 'M')
        return load_bmp(file.f, w, h, channels, error);
    // TGA has no magic; go by extension.
    size_t len = std::strlen(path);
    if (len > 4 && (std::strcmp(path + len - 4, ".tga") == 0 ||
                    std::strcmp(path + len - 4, ".TGA") == 0))
        return load_tga(file.f, w, h, channels, error);
    error->clear();  // unknown container -> bridge fallback
    return nullptr;
}

bool save_png(char const* path, uint8_t const* pixels, int w, int h,
              int channels, int stride, std::string* error) {
#ifndef DLIMG_HAVE_LIBPNG
    (void)path;
    (void)pixels;
    (void)w;
    (void)h;
    (void)channels;
    (void)stride;
    error->clear();  // no native encoder -> bridge fallback
    return false;
#else
    error->clear();
    if (channels != 1 && channels != 3 && channels != 4) {
        *error = "save_png: unsupported channel count";
        return false;
    }
    if (stride <= 0) stride = w * channels;
    File file(path, "wb");
    if (!file.f) {
        *error = std::string("cannot open ") + path;
        return false;
    }
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                              nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {
        *error = "libpng: allocation failed";
        png_destroy_write_struct(&png, &info);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        *error = "libpng: encode failed";
        png_destroy_write_struct(&png, &info);
        return false;
    }
    png_init_io(png, file.f);
    int color = channels == 1   ? PNG_COLOR_TYPE_GRAY
                : channels == 3 ? PNG_COLOR_TYPE_RGB
                                : PNG_COLOR_TYPE_RGBA;
    png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; ++y)
        rows[y] = const_cast<png_bytep>(pixels + size_t(y) * stride);
    png_write_image(png, rows.data());
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    return true;
#endif
}

}  // namespace dlimg_native
