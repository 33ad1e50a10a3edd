// Native serving-mode end-to-end: the public C++ API (dlimgedit.hpp) backed
// by the PJRT C API — no Python in the process (asserted) — computing a
// real mask and comparing it against the Python pipeline's golden.
//
// Orchestrated by tools/serving_check.py:
//   1. Python exports the serving bundle + computes the golden mask for a
//      fixed synthetic image (writes image.raw / golden.raw / meta.txt).
//   2. This binary runs with DLIMG_PJRT_BUNDLE + DLIMG_SERVING_CHECK_DIR
//      set, processes the same image through Environment/Segmentation,
//      and requires pixel-exact agreement with the golden.
// Exits 77 (ctest SKIP) when the env vars are unset.

#include <dlfcn.h>

#include <chrono>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include <dlimgedit/dlimgedit.hpp>

namespace {

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "FATAL: cannot read %s\n", path.c_str());
    std::exit(1);
  }
  std::string s((std::istreambuf_iterator<char>(f)),
                std::istreambuf_iterator<char>());
  return s;
}

}  // namespace

int main() {
  std::setbuf(stdout, nullptr);
  const char* dir_c = std::getenv("DLIMG_SERVING_CHECK_DIR");
  if (dir_c == nullptr || std::getenv("DLIMG_PJRT_BUNDLE") == nullptr) {
    std::fprintf(stderr,
                 "SKIP: DLIMG_SERVING_CHECK_DIR / DLIMG_PJRT_BUNDLE unset "
                 "(run tools/serving_check.py)\n");
    return 77;
  }
  std::string dir = dir_c;

  // meta.txt: "width height channels point_x point_y [region x0 y0 x1 y1]"
  int w, h, c, px, py;
  int rx0 = -1, ry0 = -1, rx1 = -1, ry1 = -1;
  {
    std::ifstream meta(dir + "/meta.txt");
    if (!(meta >> w >> h >> c >> px >> py)) {
      std::fprintf(stderr, "FATAL: bad meta.txt\n");
      return 1;
    }
    meta >> rx0 >> ry0 >> rx1 >> ry1;  // optional
  }
  std::string pixels = read_file(dir + "/image.raw");
  std::string golden = read_file(dir + "/golden.raw");

  dlimg::Options opts;
  opts.backend = dlimg::Backend::gpu;
  dlimg::Environment env(opts);

  dlimg::ImageView view;
  view.extent = {w, h};
  view.channels = c == 3 ? dlimg::Channels::rgb : dlimg::Channels::rgba;
  view.pixels = reinterpret_cast<const uint8_t*>(pixels.data());
  view.stride = w * c;

  auto t0 = std::chrono::steady_clock::now();
  auto seg = dlimg::Segmentation::process(view, env);
  auto t1 = std::chrono::steady_clock::now();
  dlimg::Image mask = seg.compute_mask(dlimg::Point{px, py});
  auto t2 = std::chrono::steady_clock::now();
  std::printf("process %.1f ms, compute_mask %.1f ms (through the tunnel)\n",
              std::chrono::duration<double, std::milli>(t1 - t0).count(),
              std::chrono::duration<double, std::milli>(t2 - t1).count());

  if (mask.extent().width != w || mask.extent().height != h) {
    std::fprintf(stderr, "FATAL: mask extent mismatch\n");
    return 1;
  }
  size_t n = size_t(w) * h;
  if (golden.size() != n) {
    std::fprintf(stderr, "FATAL: golden size %zu != %zu\n", golden.size(), n);
    return 1;
  }
  size_t diff = 0;
  for (size_t i = 0; i < n; ++i)
    diff += uint8_t(golden[i]) != mask.pixels()[i];
  std::printf("mask vs Python golden: %zu/%zu pixels differ\n", diff, n);
  if (diff != 0) {
    std::fprintf(stderr, "FATAL: native serving mask differs from golden\n");
    return 1;
  }

  // 3-mask decode (compute_masks) + confidences, same executable family.
  {
    std::ifstream g3(dir + "/golden3.raw", std::ios::binary);
    std::ifstream gi(dir + "/golden3_iou.raw", std::ios::binary);
    if (g3 && gi) {
      std::string golden3((std::istreambuf_iterator<char>(g3)),
                          std::istreambuf_iterator<char>());
      float want_iou[3] = {0, 0, 0};
      gi.read(reinterpret_cast<char*>(want_iou), sizeof(want_iou));
      if (golden3.size() != 3 * n) {
        std::fprintf(stderr, "FATAL: golden3 size %zu != %zu\n",
                     golden3.size(), 3 * n);
        return 1;
      }
      auto cands = seg.compute_masks(dlimg::Point{px, py});
      size_t d3 = 0;
      float diou = 0;
      for (int m = 0; m < 3; ++m) {
        const uint8_t* g = reinterpret_cast<const uint8_t*>(golden3.data()) +
                           size_t(m) * n;
        for (size_t i = 0; i < n; ++i)
          d3 += g[i] != cands[m].image.pixels()[i];
        float d = cands[m].accuracy - want_iou[m];
        if (d < 0) d = -d;
        if (d > diou) diou = d;
      }
      std::printf("compute_masks vs golden: %zu/%zu pixels differ, "
                  "max |iou d| = %g\n", d3, 3 * n, double(diou));
      if (d3 != 0 || diou > 1e-6f) {
        std::fprintf(stderr, "FATAL: 3-mask decode differs from golden\n");
        return 1;
      }
    }
  }

  // Region (box) prompt through the same decode program (labels 2/3).
  if (rx1 > 0) {
    std::ifstream gr(dir + "/golden_region.raw", std::ios::binary);
    if (gr) {
      std::string golden_r((std::istreambuf_iterator<char>(gr)),
                           std::istreambuf_iterator<char>());
      dlimg::Image rmask = seg.compute_mask(
          dlimg::Region{dlimg::Point{rx0, ry0}, dlimg::Point{rx1, ry1}});
      size_t dr = 0;
      for (size_t i = 0; i < n; ++i)
        dr += uint8_t(golden_r[i]) != rmask.pixels()[i];
      std::printf("region mask vs golden: %zu/%zu pixels differ\n", dr, n);
      if (dr != 0) {
        std::fprintf(stderr, "FATAL: region mask differs from golden\n");
        return 1;
      }
    }
  }

  // Secondary small non-square image: exercises smallest-fitting-bucket
  // selection and the resize-longest-side scale/crop math in the shim.
  {
    std::ifstream sm(dir + "/meta_small.txt");
    int sw, sh, sc, spx, spy;
    if (sm >> sw >> sh >> sc >> spx >> spy) {
      std::string spixels = read_file(dir + "/image_small.raw");
      std::string sgolden = read_file(dir + "/golden_small.raw");
      dlimg::ImageView sview;
      sview.extent = {sw, sh};
      sview.channels = sc == 3 ? dlimg::Channels::rgb : dlimg::Channels::rgba;
      sview.pixels = reinterpret_cast<const uint8_t*>(spixels.data());
      sview.stride = sw * sc;
      auto sseg = dlimg::Segmentation::process(sview, env);
      dlimg::Image smask = sseg.compute_mask(dlimg::Point{spx, spy});
      size_t sn = size_t(sw) * sh, ds = 0;
      if (sgolden.size() != sn) {
        std::fprintf(stderr, "FATAL: golden_small size %zu != %zu\n",
                     sgolden.size(), sn);
        return 1;
      }
      for (size_t i = 0; i < sn; ++i)
        ds += uint8_t(sgolden[i]) != smask.pixels()[i];
      std::printf("small-image (%dx%d) mask vs golden: %zu/%zu pixels "
                  "differ\n", sw, sh, ds, sn);
      if (ds != 0) {
        std::fprintf(stderr, "FATAL: small-image mask differs from golden\n");
        return 1;
      }
    }
  }
  // Optional BiRefNet leg (serving_check.py --birefnet): segment_objects
  // through the PJRT path vs the Python pipeline's golden. The device
  // program is the identical executable (bit-exact); the host box resize
  // may differ by one grey level at .5 ties (hostops.cpp), so bound the
  // deviation instead of requiring equality.
  std::ifstream biref_golden(dir + "/golden_objects.raw", std::ios::binary);
  if (biref_golden) {
    std::string golden_obj((std::istreambuf_iterator<char>(biref_golden)),
                           std::istreambuf_iterator<char>());
    if (golden_obj.size() != n) {
      std::fprintf(stderr, "FATAL: golden_objects size %zu != %zu\n",
                   golden_obj.size(), n);
      return 1;
    }
    std::vector<uint8_t> obj_mask(n);
    auto t3 = std::chrono::steady_clock::now();
    dlimg::segment_objects(view, obj_mask.data(), env);
    auto t4 = std::chrono::steady_clock::now();
    std::printf("segment_objects %.1f ms (through the tunnel)\n",
                std::chrono::duration<double, std::milli>(t4 - t3).count());
    int max_diff = 0;
    size_t n_diff = 0;
    for (size_t i = 0; i < n; ++i) {
      int d = int(obj_mask[i]) - int(uint8_t(golden_obj[i]));
      if (d < 0) d = -d;
      if (d > max_diff) max_diff = d;
      n_diff += d != 0;
    }
    std::printf("segment_objects vs Python golden: %zu/%zu pixels differ, "
                "max %d\n", n_diff, n, max_diff);
    if (max_diff > 1 || n_diff > n / 100) {
      std::fprintf(stderr, "FATAL: native segment_objects deviates beyond "
                           "resize .5-ties\n");
      return 1;
    }
  }

  // Optional automatic-mask-generation leg (serving_check.py --amg):
  // generate_masks through the PJRT path vs the Python pipeline's golden.
  // Identical executable on both sides -> masks, count and accuracies are
  // required bit-exact.
  {
    std::ifstream am(dir + "/meta_amg.txt");
    float iou_t, stab_t, nms_t;
    int amg_max;
    if (am >> iou_t >> stab_t >> nms_t >> amg_max) {
      std::string golden_amg = read_file(dir + "/golden_amg.raw");
      std::string golden_acc = read_file(dir + "/golden_amg_acc.raw");
      int want = int(golden_acc.size() / sizeof(float));
      auto t5 = std::chrono::steady_clock::now();
      auto gen = seg.generate_masks(iou_t, stab_t, nms_t, amg_max);
      auto t6 = std::chrono::steady_clock::now();
      std::printf("generate_masks %.1f ms (through the tunnel): %zu masks\n",
                  std::chrono::duration<double, std::milli>(t6 - t5).count(),
                  gen.size());
      if (int(gen.size()) != want) {
        std::fprintf(stderr, "FATAL: generate_masks count %zu != golden %d\n",
                     gen.size(), want);
        return 1;
      }
      if (golden_amg.size() != size_t(want) * n) {
        std::fprintf(stderr, "FATAL: golden_amg size %zu != %zu\n",
                     golden_amg.size(), size_t(want) * n);
        return 1;
      }
      const float* want_acc =
          reinterpret_cast<const float*>(golden_acc.data());
      size_t da = 0;
      float dacc = 0;
      for (int m = 0; m < want; ++m) {
        const uint8_t* g =
            reinterpret_cast<const uint8_t*>(golden_amg.data()) +
            size_t(m) * n;
        for (size_t i = 0; i < n; ++i)
          da += g[i] != gen[m].image.pixels()[i];
        float d = gen[m].accuracy - want_acc[m];
        if (d < 0) d = -d;
        if (d > dacc) dacc = d;
      }
      std::printf("generate_masks vs golden: %zu/%zu pixels differ, "
                  "max |acc d| = %g\n", da, size_t(want) * n, double(dacc));
      if (da != 0 || dacc > 1e-6f) {
        std::fprintf(stderr, "FATAL: generate_masks differs from golden\n");
        return 1;
      }
    }
  }

  // The library links libpython for the fallback bridge, but the serving
  // path must never have INITIALISED the interpreter (same assertion as
  // test_codecs.cpp).
  using IsInitFn = int (*)();
  auto is_init =
      reinterpret_cast<IsInitFn>(dlsym(RTLD_DEFAULT, "Py_IsInitialized"));
  if (is_init != nullptr && is_init() != 0) {
    std::fprintf(stderr,
                 "FATAL: Python was initialised on the serving hot path\n");
    return 1;
  }
  std::printf("PASS: native serving mask pixel-exact, Python-free hot path\n");
  return 0;
}
