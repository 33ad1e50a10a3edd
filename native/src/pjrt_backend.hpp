// Python-free serving backend: drives AOT-exported executables
// (tools/aot_export.py --program serving) through the PJRT C API.
//
// SURVEY §7 step 5's preferred design: the hot Segmentation queries run
// with no Python in the process — the embedded-CPython bridge in capi.cpp
// remains only as the fallback when no serving bundle is configured.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace dlimg_pjrt {

struct Backend;  // opaque: plugin + client + loaded executables
struct Buf;      // opaque: device buffer

// One argument to run(): either host data (copied to device) or a device
// buffer returned by a previous run (e.g. the cached image embedding).
struct Arg {
  const void* host = nullptr;          // host path: data + dims + dtype
  std::vector<int64_t> dims;
  std::string dtype;                   // "uint8" | "float32" | "int32"
  Buf* dev = nullptr;                  // device path (takes precedence)
};

// Create from a serving bundle dir; nullptr + err on failure. Reads
// plugin_path.txt + client_options.txt (written by tools/aot_export.py).
Backend* create(const std::string& bundle_dir, std::string* err);
void destroy(Backend*);

// Bundle metadata (serving.txt).
const std::string& variant(Backend*);
int image_size(Backend*);
const std::vector<int>& buckets(Backend*);

// BiRefNet programs in the bundle (empty when exported without
// --birefnet): program name is serve_birefnet_<kind>_<bucket>, output is
// a (resolution, resolution) u8 mask.
struct BirefProgram {
  std::string kind;  // "general" | "high_res"
  int bucket = 0;
  int resolution = 0;
};
const std::vector<BirefProgram>& birefnet(Backend*);

// Automatic-mask-generation program (exported with --amg grid:max_masks):
// program name is serve_amg_<variant>_<bucket>; amg_grid() == 0 when the
// bundle has none. Outputs: flat bit-packed masks (max_masks * bucket *
// bucket/8 bytes), then per-mask score/stability/area (max_masks f32 each,
// score descending; score <= 0 marks an unused slot).
int amg_grid(Backend*);
int amg_masks(Backend*);

// Batched multi-prompt decode programs (exported with --batch-sizes):
// program name is serve_decode_batch<nb>_<variant>_<bucket>. Empty when
// the bundle has none; sorted ascending.
const std::vector<int>& batch_sizes(Backend*);

// Execute program `name` (lazy deserialize of <name>.pjrt). Outputs are
// returned as device buffers; fetch() copies one to the host. Returns
// false + err on failure.
bool run(Backend*, const std::string& name, const std::vector<Arg>& args,
         std::vector<Buf*>* outs, std::string* err);
bool fetch(Backend*, Buf*, void* dst, size_t dst_size, std::string* err);
void release(Backend*, Buf*);

// Per-program self-check: run `name` with the example dynamic inputs the
// export saved (<name>.in<j>.npy for spec "ind" lines) and compare every
// output byte-exactly against <name>.out<i>.npy. Isolates C-runner bugs
// (argument interleaving, staging, dtype) from pipeline-level divergence.
// f32_ulp > 0 relaxes FLOAT32 outputs only, to an element-wise ULP
// distance <= f32_ulp (for the hermetic CPU tier, where the plugin's own
// XLA recompiles the program and may legally reorder fma — masks and every
// integer output stay byte-exact).
bool validate(Backend*, const std::string& name, std::string* report,
              std::string* err, int f32_ulp = 0);

}  // namespace dlimg_pjrt
