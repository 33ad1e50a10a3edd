// Per-program bit-exact validation of a serving bundle: each exported
// program is run through the PJRT C API with the example dynamic inputs
// recorded by tools/aot_export.py and its outputs compared byte-exactly
// against the jax-computed expectations. Separates C-runner bugs
// (argument interleaving, staging, dtype handling) from pipeline-level
// divergence in the public-API e2e (test_serving.cpp).
//
//   test_serving_programs [--f32-ulp=N] <bundle_dir> <program> [...]
//
// --f32-ulp=N relaxes FLOAT32 outputs to an element-wise ULP distance of
// N (for the hermetic CPU tier, whose plugin recompiles the program with
// its own XLA and may legally reorder fma); everything else, including
// the packed masks, stays byte-exact.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#include "../src/pjrt_backend.hpp"

int main(int argc, char** argv) {
  std::setbuf(stdout, nullptr);
  int f32_ulp = 0;
  int argi = 1;
  if (argi < argc && std::strncmp(argv[argi], "--f32-ulp=", 10) == 0)
    f32_ulp = std::atoi(argv[argi++] + 10);
  if (argc - argi < 2) {
    std::fprintf(stderr,
                 "usage: %s [--f32-ulp=N] <bundle_dir> <program>...\n",
                 argv[0]);
    return 2;
  }
  std::string err;
  dlimg_pjrt::Backend* be = dlimg_pjrt::create(argv[argi++], &err);
  if (!be) {
    std::fprintf(stderr, "FATAL: backend: %s\n", err.c_str());
    return 1;
  }
  int failures = 0;
  for (int i = argi; i < argc; ++i) {
    std::string report;
    bool ok = dlimg_pjrt::validate(be, argv[i], &report, &err, f32_ulp);
    std::printf("%s%s: %s\n", report.c_str(), argv[i],
                ok ? "PASS" : ("FAIL (" + err + ")").c_str());
    failures += !ok;
  }
  dlimg_pjrt::destroy(be);
  return failures == 0 ? 0 : 1;
}
