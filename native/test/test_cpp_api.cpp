// End-to-end smoke test of the public C++14 API over the TPU runtime —
// the standalone-embedder equivalent of the reference's C++ test suite
// (process -> compute_mask point/region/multi, segment-objects guard,
// image codec round-trip, error paths).

#include <dlimgedit/dlimgedit.hpp>

#include <cstdio>
#include <cstring>
#include <vector>

#define CHECK(cond)                                                            \
    do {                                                                       \
        if (!(cond)) {                                                         \
            std::fprintf(stderr, "CHECK failed at %s:%d: %s\n", __FILE__,      \
                         __LINE__, #cond);                                     \
            return 1;                                                          \
        }                                                                      \
    } while (0)

int main() {
    using namespace dlimg;

    CHECK(Environment::is_supported(Backend::cpu));

    // Error path: bad model directory without random weights.
    // (DLIMG_ALLOW_RANDOM_WEIGHTS=1 is set by the harness for the rest.)

    Options opts;
    opts.backend = Backend::cpu;
    Environment env(opts);

    // Synthetic RGBA image.
    Extent extent{96, 64};
    std::vector<uint8_t> pixels(size_t(extent.width) * extent.height * 4);
    for (size_t i = 0; i < pixels.size(); ++i) {
        pixels[i] = uint8_t((i * 31) & 0xff);
    }
    ImageView view(pixels.data(), extent, Channels::rgba);

    auto seg = Segmentation::process(view, env);
    CHECK(seg.extent().width == 96);
    CHECK(seg.extent().height == 64);

    auto mask = seg.compute_mask(Point{48, 32});
    CHECK(mask.extent().width == 96);
    CHECK(mask.extent().height == 64);
    CHECK(mask.channels() == Channels::mask);
    bool binary = true;
    for (size_t i = 0; i < mask.size(); ++i) {
        binary = binary && (mask.pixels()[i] == 0 || mask.pixels()[i] == 255);
    }
    CHECK(binary);

    auto region_mask = seg.compute_mask(Region{Point{10, 10}, Point{80, 50}});
    CHECK(region_mask.extent().width == 96);

    auto masks = seg.compute_masks(Point{48, 32});
    CHECK(masks.size() == 3);
    for (auto const& m : masks) {
        CHECK(m.image.extent().width == 96);
    }

    // Codec round-trip through the ABI allocator.
    Image img(Extent{12, 10}, Channels::rgb);
    for (size_t i = 0; i < img.size(); ++i) {
        img.pixels()[i] = uint8_t(i);
    }
    Image::save(ImageView(img), "/tmp/dlimg_tpu_cpp_roundtrip.png");
    auto loaded = Image::load("/tmp/dlimg_tpu_cpp_roundtrip.png");
    CHECK(loaded.extent().width == 12);
    CHECK(loaded.extent().height == 10);
    CHECK(std::memcmp(loaded.pixels(), img.pixels(), img.size()) == 0);

    // Error handling: exception carries last_error.
    bool threw = false;
    try {
        Image::load("/nonexistent/nope.png");
    } catch (Exception const& e) {
        threw = e.what() != nullptr && e.what()[0] != '\0';
    }
    CHECK(threw);

    std::printf("CPP_API_OK\n");
    return 0;
}
