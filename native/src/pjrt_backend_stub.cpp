// Fallback when the PJRT C API header is unavailable at build time: the
// serving mode reports a descriptive error and the embedded-Python bridge
// remains the only backend. (CMake selects this or pjrt_backend.cpp.)

#include "pjrt_backend.hpp"

namespace dlimg_pjrt {

namespace {
const std::string kEmpty;
const std::vector<int> kNoBuckets;
const std::vector<BirefProgram> kNoBiref;
}  // namespace

Backend* create(const std::string&, std::string* err) {
  if (err)
    *err = "this build has no PJRT C-API support (pjrt_c_api.h was not "
           "found at configure time)";
  return nullptr;
}
void destroy(Backend*) {}
const std::string& variant(Backend*) { return kEmpty; }
int image_size(Backend*) { return 0; }
const std::vector<int>& buckets(Backend*) { return kNoBuckets; }
const std::vector<BirefProgram>& birefnet(Backend*) { return kNoBiref; }
bool run(Backend*, const std::string&, const std::vector<Arg>&,
         std::vector<Buf*>*, std::string* err) {
  if (err) *err = "PJRT support not built";
  return false;
}
bool fetch(Backend*, Buf*, void*, size_t, std::string* err) {
  if (err) *err = "PJRT support not built";
  return false;
}
bool validate(Backend*, const std::string&, std::string*, std::string* err) {
  if (err) *err = "PJRT support not built";
  return false;
}
void release(Backend*, Buf*) {}

}  // namespace dlimg_pjrt
