// Plugin-free validation of a serving bundle's on-disk contract.
//
// For every <program>.spec.txt in the bundle dir, parse each `in*`/`out`
// row, load the corresponding .npy through the loader's OWN parser
// (native/src/npy.hpp, shared with pjrt_backend.cpp) and assert dtype,
// dims, and payload size agree — including the |i1 int8 weight rows of
// quantized bundles. This is the hermetic half of the serving validation:
// it catches exporter/loader dialect drift without a PJRT plugin; the
// on-hardware half (test_serving_programs / serving_check.py) proves
// execution.
//
// Usage: test_bundle_parse <bundle_dir>    (exit 77 = skip, no dir given)

#include <cstdint>
#include <cstdio>
#include <filesystem>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "../src/npy.hpp"

namespace fs = std::filesystem;

static int element_size(const std::string& dtype) {
  if (dtype == "float32" || dtype == "int32") return 4;
  if (dtype == "bfloat16") return 2;
  if (dtype == "uint8" || dtype == "int8") return 1;
  return 0;
}

// "d0,d1,..." -> dims; false on any non-numeric token ("" -> scalar, ok).
static bool parse_dims(const std::string& s, std::vector<int64_t>* out) {
  out->clear();
  if (s.empty()) return true;
  std::stringstream ds(s);
  std::string tok;
  while (std::getline(ds, tok, ',')) {
    if (tok.empty() ||
        tok.find_first_not_of("0123456789") != std::string::npos)
      return false;
    out->push_back(std::stoll(tok));
  }
  return true;
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
    std::string line;
    int in_idx = 0, out_idx = 0;
    ++programs;
    // Line-based parse: a row is "kind dtype dims" where dims may be empty
    // for a scalar — token-stream >> would desync across lines there.
    while (std::getline(spec, line)) {
      if (line.empty()) continue;
      std::stringstream ls(line);
      std::string kind, dtype, dims;
      ls >> kind >> dtype;
      ls >> dims;  // may legitimately fail (scalar row: empty dims)
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
      std::vector<int64_t> want_dims;
      if (dtype.empty() || !parse_dims(dims, &want_dims)) {
        std::fprintf(stderr, "FATAL: %s: malformed spec row '%s'\n",
                     fname.c_str(), line.c_str());
        return 1;
      }
      dlimg_npy::Npy got;
      std::string err;
      if (!dlimg_npy::load_npy((dir / npy).string(), &got, &err)) {
        std::fprintf(stderr, "FATAL: loader cannot parse %s: %s\n",
                     npy.c_str(), err.c_str());
        return 1;
      }
      if (got.dtype != dtype) {
        std::fprintf(stderr, "FATAL: %s: dtype %s != spec %s\n", npy.c_str(),
                     got.dtype.c_str(), dtype.c_str());
        return 1;
      }
      if (got.shape != want_dims) {
        std::fprintf(stderr, "FATAL: %s: dims mismatch vs spec '%s'\n",
                     npy.c_str(), dims.c_str());
        return 1;
      }
      int64_t n = 1;
      for (int64_t d : want_dims) n *= d;
      const size_t want = size_t(n) * element_size(dtype);
      if (got.data.size() != want) {
        std::fprintf(stderr, "FATAL: %s: payload %zu bytes != %zu\n",
                     npy.c_str(), got.data.size(), want);
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
