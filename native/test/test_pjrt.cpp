// Python-free hot path spike: run an AOT-exported executable through the
// PJRT C API — no libpython anywhere in this binary.
//
// SURVEY §7 step 5 preferred "AOT-compile the jitted programs and call
// through PJRT's C API so the shim has no Python dependency at runtime"
// over the embedded-CPython bridge that native/src/capi.cpp ships. This
// test decides that question with data: it loads the PJRT plugin
// (dlopen), creates a client, deserializes an executable exported by
// tools/aot_export.py, feeds the exported sample inputs, validates the
// outputs numerically against the jax-computed expectation, and measures
// the per-call shim overhead.
//
// Run:  python tools/aot_export.py --out /tmp/dlimg_aot --program smoke
//       DLIMG_PJRT_EXPORT_DIR=/tmp/dlimg_aot ./test_pjrt [program]
// Skips (rc 77) when DLIMG_PJRT_EXPORT_DIR is unset.

#include <dlfcn.h>

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace {

[[noreturn]] void die(const std::string& msg) {
  std::fprintf(stderr, "FATAL: %s\n", msg.c_str());
  std::exit(1);
}

const PJRT_Api* g_api = nullptr;

void check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args m{};
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = err;
  g_api->PJRT_Error_Message(&m);
  std::string text(m.message, m.message_size);
  PJRT_Error_Destroy_Args d{};
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = err;
  g_api->PJRT_Error_Destroy(&d);
  die(std::string(what) + ": " + text);
}

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) die("cannot read " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

// --- minimal .npy (v1.x, little-endian, C-contiguous) reader ---------------
struct Npy {
  std::string dtype;            // "float32", "int32", "uint8", "bfloat16"
  std::vector<int64_t> shape;
  std::string data;             // raw bytes
};

Npy load_npy(const std::string& path) {
  std::string raw = read_file(path);
  if (raw.size() < 10 || std::memcmp(raw.data(), "\x93NUMPY", 6) != 0)
    die("bad npy magic: " + path);
  unsigned hlen = static_cast<unsigned char>(raw[8]) |
                  (static_cast<unsigned char>(raw[9]) << 8);
  std::string hdr = raw.substr(10, hlen);
  Npy out;
  auto dpos = hdr.find("'descr':");
  auto q1 = hdr.find('\'', dpos + 8);
  auto q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4") out.dtype = "float32";
  else if (descr == "<i4") out.dtype = "int32";
  else if (descr == "|u1") out.dtype = "uint8";
  else if (descr == "<V2" || descr == "<u2") out.dtype = "bfloat16";
  else die("unsupported npy descr " + descr + " in " + path);
  if (hdr.find("'fortran_order': False") == std::string::npos)
    die("fortran-order npy unsupported: " + path);
  auto spos = hdr.find("'shape':");
  auto p1 = hdr.find('(', spos);
  auto p2 = hdr.find(')', p1);
  std::string dims = hdr.substr(p1 + 1, p2 - p1 - 1);
  std::stringstream ds(dims);
  std::string tok;
  while (std::getline(ds, tok, ',')) {
    if (tok.find_first_of("0123456789") == std::string::npos) continue;
    out.shape.push_back(std::stoll(tok));
  }
  out.data = raw.substr(10 + hlen);
  return out;
}

PJRT_Buffer_Type dtype_enum(const std::string& d) {
  if (d == "float32") return PJRT_Buffer_Type_F32;
  if (d == "int32") return PJRT_Buffer_Type_S32;
  if (d == "uint8") return PJRT_Buffer_Type_U8;
  if (d == "bfloat16") return PJRT_Buffer_Type_BF16;
  die("unsupported dtype " + d);
}

void await_event(PJRT_Event* ev, const char* what) {
  PJRT_Event_Await_Args a{};
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  check(g_api->PJRT_Event_Await(&a), what);
  PJRT_Event_Destroy_Args d{};
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  check(g_api->PJRT_Event_Destroy(&d), "event destroy");
}

}  // namespace

int main(int argc, char** argv) {
  std::setbuf(stdout, nullptr);  // survive crashes with partial output
  const char* dir_c = std::getenv("DLIMG_PJRT_EXPORT_DIR");
  if (dir_c == nullptr) {
    std::fprintf(stderr,
                 "SKIP: DLIMG_PJRT_EXPORT_DIR unset "
                 "(run tools/aot_export.py first)\n");
    return 77;
  }
  std::string dir = dir_c;
  std::string prog = argc > 1 ? argv[1] : "smoke";

  // Proof of the design goal: this process must have no Python runtime.
  if (dlsym(RTLD_DEFAULT, "Py_Initialize") != nullptr)
    die("libpython is loaded in this process — spike invalidated");

  // 1. Load the plugin.
  std::string so = read_file(dir + "/plugin_path.txt");
  while (!so.empty() && (so.back() == '\n' || so.back() == ' '))
    so.pop_back();
  void* lib = dlopen(so.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (lib == nullptr) die(std::string("dlopen ") + so + ": " + dlerror());
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(lib, "GetPjrtApi"));
  if (get_api == nullptr) die("GetPjrtApi not found in plugin");
  g_api = get_api();
  std::printf("PJRT plugin %s, api %d.%d\n", so.c_str(),
              g_api->pjrt_api_version.major_version,
              g_api->pjrt_api_version.minor_version);

  std::printf("step: plugin init (api struct_size=%zu)\n", g_api->struct_size);
  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  check(g_api->PJRT_Plugin_Initialize(&init), "plugin init");
  std::printf("step: plugin init ok\n");

  // 2. Client with the captured named options (key\ttype\tvalue lines).
  std::vector<PJRT_NamedValue> opts;
  std::deque<std::string> keep;  // backing strings (stable addresses)
  {
    std::istringstream f(read_file(dir + "/client_options.txt"));
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty()) continue;
      auto t1 = line.find('\t');
      auto t2 = line.find('\t', t1 + 1);
      if (t1 == std::string::npos || t2 == std::string::npos) continue;
      keep.push_back(line.substr(0, t1));
      const std::string& key = keep.back();
      std::string type = line.substr(t1 + 1, t2 - t1 - 1);
      keep.push_back(line.substr(t2 + 1));
      const std::string& val = keep.back();
      PJRT_NamedValue nv{};
      nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv.name = key.c_str();
      nv.name_size = key.size();
      if (type == "i") {
        nv.type = PJRT_NamedValue_kInt64;
        nv.int64_value = std::stoll(val);
        nv.value_size = 1;
      } else if (type == "b") {
        nv.type = PJRT_NamedValue_kBool;
        nv.bool_value = val == "1" || val == "true" || val == "True";
        nv.value_size = 1;
      } else {
        nv.type = PJRT_NamedValue_kString;
        nv.string_value = val.c_str();
        nv.value_size = val.size();
      }
      opts.push_back(nv);
    }
  }
  std::printf("step: client create (%zu options)\n", opts.size());
  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = opts.data();
  cc.num_options = opts.size();
  check(g_api->PJRT_Client_Create(&cc), "client create");
  PJRT_Client* client = cc.client;
  std::printf("step: client ok\n");

  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = client;
  check(g_api->PJRT_Client_AddressableDevices(&ad), "devices");
  if (ad.num_addressable_devices == 0) die("no addressable devices");
  PJRT_Device* device = ad.addressable_devices[0];
  std::printf("devices: %zu\n", ad.num_addressable_devices);

  // 3. Deserialize the executable.
  std::string blob = read_file(dir + "/" + prog + ".pjrt");
  PJRT_Executable_DeserializeAndLoad_Args dl{};
  dl.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
  dl.client = client;
  dl.serialized_executable = blob.data();
  dl.serialized_executable_size = blob.size();
  check(g_api->PJRT_Executable_DeserializeAndLoad(&dl), "deserialize");
  PJRT_LoadedExecutable* exec = dl.loaded_executable;
  std::printf("loaded %s.pjrt (%zu bytes)\n", prog.c_str(), blob.size());

  // 4. Input buffers from the exported samples.
  std::vector<Npy> inputs;
  for (int i = 0;; ++i) {
    std::string p = dir + "/" + prog + ".in" + std::to_string(i) + ".npy";
    std::ifstream probe(p);
    if (!probe) break;
    inputs.push_back(load_npy(p));
  }
  if (inputs.empty()) die("no inputs exported");
  std::vector<PJRT_Buffer*> args_bufs;
  for (auto& in : inputs) {
    PJRT_Client_BufferFromHostBuffer_Args bh{};
    bh.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    bh.client = client;
    bh.data = in.data.data();
    bh.type = dtype_enum(in.dtype);
    bh.dims = in.shape.data();
    bh.num_dims = in.shape.size();
    bh.host_buffer_semantics =
        PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    bh.device = device;
    check(g_api->PJRT_Client_BufferFromHostBuffer(&bh), "h2d");
    await_event(bh.done_with_host_buffer, "h2d done");
    args_bufs.push_back(bh.buffer);
  }

  // 5. Execute (1 warmup + timed loop).
  size_t num_outputs = 0;
  {
    PJRT_Executable_NumOutputs_Args no{};
    no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
    PJRT_LoadedExecutable_GetExecutable_Args ge{};
    ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
    ge.loaded_executable = exec;
    check(g_api->PJRT_LoadedExecutable_GetExecutable(&ge), "get exec");
    no.executable = ge.executable;
    check(g_api->PJRT_Executable_NumOutputs(&no), "num outputs");
    num_outputs = no.num_outputs;
  }
  std::vector<PJRT_Buffer*> out_bufs(num_outputs, nullptr);
  auto run_once = [&]() {
    // Destroy previous iteration's outputs.
    for (auto*& b : out_bufs) {
      if (b != nullptr) {
        PJRT_Buffer_Destroy_Args bd{};
        bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
        bd.buffer = b;
        check(g_api->PJRT_Buffer_Destroy(&bd), "buffer destroy");
        b = nullptr;
      }
    }
    PJRT_ExecuteOptions eo{};
    eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const* arg_list = args_bufs.data();
    PJRT_Buffer** out_list = out_bufs.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args ex{};
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &eo;
    ex.argument_lists = &arg_list;
    ex.num_devices = 1;
    ex.num_args = args_bufs.size();
    ex.output_lists = &out_list;
    ex.device_complete_events = &done;
    check(g_api->PJRT_LoadedExecutable_Execute(&ex), "execute");
    await_event(done, "execute done");
  };
  run_once();
  const int iters = 10;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) run_once();
  double ms = std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - t0)
                  .count() /
              iters;
  std::printf("execute+sync: %.3f ms/call (n=%d)\n", ms, iters);

  // 6. Fetch + numerically validate against the jax-computed expectation.
  for (size_t oi = 0; oi < num_outputs; ++oi) {
    size_t o = num_outputs - 1 - oi;  // fetch the small trailing output first
    Npy want = load_npy(dir + "/" + prog + ".out" + std::to_string(o) +
                        ".npy");
    std::printf("step: d2h output %zu (%zu bytes)\n", o, want.data.size());
    PJRT_Buffer_ToHostBuffer_Args th{};
    th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    th.src = out_bufs[o];
    std::vector<char> got(want.data.size());
    th.dst = got.data();
    th.dst_size = got.size();
    check(g_api->PJRT_Buffer_ToHostBuffer(&th), "d2h");
    std::printf("step: d2h issued, awaiting\n");
    await_event(th.event, "d2h done");
    if (got.size() != want.data.size())
      die("output " + std::to_string(o) + " size mismatch: got " +
          std::to_string(got.size()) + " want " +
          std::to_string(want.data.size()));
    if (want.dtype == "float32") {
      const float* a = reinterpret_cast<const float*>(got.data());
      const float* b = reinterpret_cast<const float*>(want.data.data());
      size_t n = got.size() / 4;
      double max_abs = 0;
      for (size_t i = 0; i < n; ++i)
        max_abs = std::max(max_abs, std::fabs(double(a[i]) - double(b[i])));
      std::printf("output %zu: f32 max|d| = %.3e\n", o, max_abs);
      if (max_abs > 1e-3) die("output mismatch beyond tolerance");
    } else {
      size_t diff = 0;
      for (size_t i = 0; i < got.size(); ++i)
        diff += got[i] != want.data[i];
      std::printf("output %zu: %zu/%zu bytes differ\n", o, diff,
                  got.size());
      if (diff > got.size() / 1000) die("byte outputs differ");
    }
  }
  std::printf("PASS: PJRT C-API %s query, libpython-free process\n",
              prog.c_str());
  return 0;
}
