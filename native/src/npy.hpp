// Minimal .npy (v1.x, little-endian, C-contiguous) reader.
//
// Shared by the PJRT serving backend (pjrt_backend.cpp) and the
// plugin-free bundle-contract test (test/test_bundle_parse.cpp) so both
// sides read the exporter's files through the SAME dialect — header-only
// and PJRT-free on purpose.
#pragma once

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace dlimg_npy {

struct Npy {
  std::string dtype;
  std::vector<int64_t> shape;
  std::string data;
};

inline bool load_npy(const std::string& path, Npy* out, std::string* err) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    if (err) *err = "cannot open " + path;
    return false;
  }
  std::string raw((std::istreambuf_iterator<char>(f)),
                  std::istreambuf_iterator<char>());
  if (raw.size() < 10 || std::memcmp(raw.data(), "\x93NUMPY", 6) != 0) {
    if (err) *err = "bad npy magic: " + path;
    return false;
  }
  unsigned hlen = static_cast<unsigned char>(raw[8]) |
                  (static_cast<unsigned char>(raw[9]) << 8);
  if (raw.size() < 10 + hlen) {
    if (err) *err = "truncated npy header: " + path;
    return false;
  }
  std::string hdr = raw.substr(10, hlen);
  if (hdr.find("'fortran_order': True") != std::string::npos) {
    // This loader streams raw bytes as C-order; a Fortran-ordered array
    // would silently transpose. The exporter writes C-contiguous arrays
    // (tools/aot_export.py ascontiguousarray) — refuse stale bundles.
    if (err)
      *err = "Fortran-ordered npy " + path +
             " (stale bundle; re-run tools/aot_export.py)";
    return false;
  }
  auto dpos = hdr.find("'descr':");
  auto q1 = hdr.find('\'', dpos + 8);
  auto q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4") out->dtype = "float32";
  else if (descr == "<i4") out->dtype = "int32";
  else if (descr == "|u1") out->dtype = "uint8";
  else if (descr == "|i1") out->dtype = "int8";  // quantized serving bundles
  else if (descr == "<V2" || descr == "<u2") out->dtype = "bfloat16";
  else {
    if (err) *err = "unsupported npy descr " + descr + " in " + path;
    return false;
  }
  auto spos = hdr.find("'shape':");
  auto p1 = hdr.find('(', spos);
  auto p2 = hdr.find(')', p1);
  std::stringstream ds(hdr.substr(p1 + 1, p2 - p1 - 1));
  std::string tok;
  out->shape.clear();
  while (std::getline(ds, tok, ',')) {
    if (tok.find_first_of("0123456789") == std::string::npos) continue;
    out->shape.push_back(std::stoll(tok));
  }
  out->data = raw.substr(10 + hlen);
  return true;
}

}  // namespace dlimg_npy
