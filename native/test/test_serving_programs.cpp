// Per-program bit-exact validation of a serving bundle: each exported
// program is run through the PJRT C API with the example dynamic inputs
// recorded by tools/aot_export.py and its outputs compared byte-exactly
// against the jax-computed expectations. Separates C-runner bugs
// (argument interleaving, staging, dtype handling) from pipeline-level
// divergence in the public-API e2e (test_serving.cpp).
//
//   test_serving_programs <bundle_dir> <program> [<program> ...]

#include <cstdio>
#include <string>

#include "../src/pjrt_backend.hpp"

int main(int argc, char** argv) {
  std::setbuf(stdout, nullptr);
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <bundle_dir> <program>...\n", argv[0]);
    return 2;
  }
  std::string err;
  dlimg_pjrt::Backend* be = dlimg_pjrt::create(argv[1], &err);
  if (!be) {
    std::fprintf(stderr, "FATAL: backend: %s\n", err.c_str());
    return 1;
  }
  int failures = 0;
  for (int i = 2; i < argc; ++i) {
    std::string report;
    bool ok = dlimg_pjrt::validate(be, argv[i], &report, &err);
    std::printf("%s%s: %s\n", report.c_str(), argv[i],
                ok ? "PASS" : ("FAIL (" + err + ")").c_str());
    failures += !ok;
  }
  dlimg_pjrt::destroy(be);
  return failures == 0 ? 0 : 1;
}
