// Plugin-free validation of a serving bundle's on-disk contract.
//
// For every <program>.spec.txt in the bundle dir, parse each `in*`/`out`
// row, load the corresponding .npy through the C loader's OWN parser
// (dlimg_pjrt::debug_npy_info) and assert dtype, dims, and payload size
// agree — including the |i1 int8 weight rows of quantized bundles. This is
// the hermetic half of the serving validation: it catches exporter/loader
// dialect drift without a PJRT plugin; the on-hardware half
// (test_serving_programs / serving_check.py) proves execution.
//
// Usage: test_bundle_parse <bundle_dir>    (exit 77 = skip, no dir given)

#include <cstdint>
#include <cstdio>
#include <filesystem>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "../src/pjrt_backend.hpp"

namespace fs = std::filesystem;

static int element_size(const std::string& dtype) {
  if (dtype == "float32" || dtype == "int32") return 4;
  if (dtype == "bfloat16") return 2;
  if (dtype == "uint8" || dtype == "int8") return 1;
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "SKIP: no bundle dir argument\n");
    return 77;
  }
  fs::path dir(argv[1]);
  int programs = 0, rows = 0, int8_rows = 0;
  for (const auto& ent : fs::directory_iterator(dir)) {
    const std::string fname = ent.path().filename().string();
    const std::string suffix = ".spec.txt";
    if (fname.size() <= suffix.size() ||
        fname.compare(fname.size() - suffix.size(), suffix.size(), suffix))
      continue;
    const std::string prog = fname.substr(0, fname.size() - suffix.size());
    std::ifstream spec(ent.path());
    std::string kind, dtype, dims;
    int in_idx = 0, out_idx = 0;
    ++programs;
    while (spec >> kind >> dtype >> dims) {
      std::string npy;
      if (kind.rfind("in", 0) == 0) {
        npy = prog + ".in" + std::to_string(in_idx++) + ".npy";
      } else if (kind == "out") {
        npy = prog + ".out" + std::to_string(out_idx++) + ".npy";
      } else {
        std::fprintf(stderr, "FATAL: %s: unknown spec row kind '%s'\n",
                     fname.c_str(), kind.c_str());
        return 1;
      }
      std::string info = dlimg_pjrt::debug_npy_info((dir / npy).string());
      if (info.empty()) {
        std::fprintf(stderr, "FATAL: loader cannot parse %s (spec row "
                     "'%s %s %s')\n", npy.c_str(), kind.c_str(),
                     dtype.c_str(), dims.c_str());
        return 1;
      }
      std::stringstream ss(info);
      std::string got_dtype, got_dims;
      size_t got_bytes = 0;
      ss >> got_dtype >> got_dims >> got_bytes;
      if (got_dtype != dtype) {
        std::fprintf(stderr, "FATAL: %s: dtype %s != spec %s\n", npy.c_str(),
                     got_dtype.c_str(), dtype.c_str());
        return 1;
      }
      // Scalars: the spec writes an empty dim list as "" (never happens
      // today) and the parser reports "-"; dims otherwise match verbatim.
      if (got_dims != dims && !(got_dims == "-" && dims.empty())) {
        std::fprintf(stderr, "FATAL: %s: dims %s != spec %s\n", npy.c_str(),
                     got_dims.c_str(), dims.c_str());
        return 1;
      }
      int64_t n = 1;
      std::stringstream ds(dims);
      std::string tok;
      while (std::getline(ds, tok, ',')) n *= std::stoll(tok);
      const size_t want = size_t(n) * element_size(dtype);
      if (got_bytes != want) {
        std::fprintf(stderr, "FATAL: %s: payload %zu bytes != %zu\n",
                     npy.c_str(), got_bytes, want);
        return 1;
      }
      ++rows;
      if (dtype == "int8") ++int8_rows;
    }
  }
  if (programs == 0) {
    std::fprintf(stderr, "FATAL: no .spec.txt programs in %s\n", argv[1]);
    return 1;
  }
  std::printf("bundle parse OK: %d programs, %d rows (%d int8)\n",
              programs, rows, int8_rows);
  return 0;
}
