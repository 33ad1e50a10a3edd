// PJRT C-API serving backend (see pjrt_backend.hpp).
//
// Environment specifics learned by the round-3 spike (BENCH_NOTES):
//   * the plugin may be older than the header (API 0.54 vs 0.90) — fine,
//     every call used here predates 0.54 and PJRT's ABI is append-only;
//   * ToHostBuffer's dst=nullptr size query hangs on older plugins — the
//     caller always passes an explicit size;
//   * on the tunneled-TPU image the C process needs
//     AXON_POOL_SVC_OVERRIDE set (the Python sitecustomize does this
//     mapping for Python processes) — create() mirrors it.

#include "pjrt_backend.hpp"

#include <dlfcn.h>
#include <stdlib.h>

#include <algorithm>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <memory>
#include <mutex>
#include <sstream>

#include "npy.hpp"
#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

namespace dlimg_pjrt {
namespace {

std::string read_file(const std::string& path, std::string* err) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    if (err) *err = "cannot read " + path;
    return "";
  }
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

bool check(const PJRT_Api* api, PJRT_Error* e, const char* what,
           std::string* err) {
  if (e == nullptr) return true;
  PJRT_Error_Message_Args m{};
  m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  m.error = e;
  api->PJRT_Error_Message(&m);
  if (err) *err = std::string(what) + ": " + std::string(m.message, m.message_size);
  PJRT_Error_Destroy_Args d{};
  d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  d.error = e;
  api->PJRT_Error_Destroy(&d);
  return false;
}

bool await_event(const PJRT_Api* api, PJRT_Event* ev, const char* what,
                 std::string* err) {
  PJRT_Event_Await_Args a{};
  a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  a.event = ev;
  bool ok = check(api, api->PJRT_Event_Await(&a), what, err);
  PJRT_Event_Destroy_Args d{};
  d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  d.event = ev;
  check(api, api->PJRT_Event_Destroy(&d), "event destroy", ok ? err : nullptr);
  return ok;
}

struct Exec {
  PJRT_LoadedExecutable* exec = nullptr;
  size_t num_outputs = 0;
  // Kept-argument layout from <name>.spec.txt: true = weight (pre-uploaded
  // device buffer in `weights`, same order), false = dynamic (fed per run).
  std::vector<bool> is_weight;
  std::vector<PJRT_Buffer*> weights;
};

// .npy reading shared with the plugin-free bundle test (native/src/npy.hpp).
using dlimg_npy::Npy;
using dlimg_npy::load_npy;

PJRT_Buffer_Type dtype_enum(const std::string& d) {
  if (d == "float32") return PJRT_Buffer_Type_F32;
  if (d == "int32") return PJRT_Buffer_Type_S32;
  if (d == "uint8") return PJRT_Buffer_Type_U8;
  if (d == "int8") return PJRT_Buffer_Type_S8;
  if (d == "bfloat16") return PJRT_Buffer_Type_BF16;
  return PJRT_Buffer_Type_INVALID;
}

}  // namespace

struct Buf {
  PJRT_Buffer* b;
};

struct Backend {
  void* lib = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  std::string dir;
  std::string variant_;
  int image_size_ = 1024;
  std::vector<int> buckets_;
  std::vector<BirefProgram> birefnet_;
  int amg_grid_ = 0;   // 0 = bundle exported without --amg
  int amg_masks_ = 0;
  std::vector<int> batch_sizes_;  // empty = no batch decode programs
  std::map<std::string, Exec> execs;
  std::mutex mu;  // serializes run/fetch (PJRT is thread-safe, but the
                  // lazy exec map and error strings are simpler guarded)
};

const std::string& variant(Backend* b) { return b->variant_; }
int image_size(Backend* b) { return b->image_size_; }
const std::vector<int>& buckets(Backend* b) { return b->buckets_; }
const std::vector<BirefProgram>& birefnet(Backend* b) { return b->birefnet_; }
int amg_grid(Backend* b) { return b->amg_grid_; }
int amg_masks(Backend* b) { return b->amg_masks_; }
const std::vector<int>& batch_sizes(Backend* b) { return b->batch_sizes_; }

Backend* create(const std::string& bundle_dir, std::string* err) {
  auto be = std::make_unique<Backend>();
  be->dir = bundle_dir;

  // Tunnel environments: mirror the sitecustomize mapping so the plugin's
  // pool provider can find the relay (no-op when already set / not needed).
  if (getenv("PALLAS_AXON_POOL_IPS") && !getenv("AXON_POOL_SVC_OVERRIDE"))
    setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);

  std::string so = read_file(bundle_dir + "/plugin_path.txt", err);
  while (!so.empty() && (so.back() == '\n' || so.back() == ' '))
    so.pop_back();
  if (so.empty()) {
    if (err && err->empty()) *err = "empty plugin_path.txt";
    return nullptr;
  }
  be->lib = dlopen(so.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (!be->lib) {
    if (err) *err = std::string("dlopen ") + so + ": " + dlerror();
    return nullptr;
  }
  using GetApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetApiFn>(dlsym(be->lib, "GetPjrtApi"));
  if (!get_api) {
    if (err) *err = "GetPjrtApi not found in " + so;
    return nullptr;
  }
  be->api = get_api();
  PJRT_Plugin_Initialize_Args init{};
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  if (!check(be->api, be->api->PJRT_Plugin_Initialize(&init), "plugin init",
             err))
    return nullptr;

  // Client options captured at export time (key \t type \t value).
  std::vector<PJRT_NamedValue> opts;
  std::deque<std::string> keep;
  {
    std::istringstream f(read_file(bundle_dir + "/client_options.txt", err));
    std::string line;
    while (std::getline(f, line)) {
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
  PJRT_Client_Create_Args cc{};
  cc.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cc.create_options = opts.data();
  cc.num_options = opts.size();
  if (!check(be->api, be->api->PJRT_Client_Create(&cc), "client create", err))
    return nullptr;
  be->client = cc.client;

  PJRT_Client_AddressableDevices_Args ad{};
  ad.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  ad.client = be->client;
  if (!check(be->api, be->api->PJRT_Client_AddressableDevices(&ad), "devices",
             err))
    return nullptr;
  if (ad.num_addressable_devices == 0) {
    if (err) *err = "no addressable devices";
    return nullptr;
  }
  be->device = ad.addressable_devices[0];

  // serving.txt metadata.
  {
    std::istringstream f(read_file(bundle_dir + "/serving.txt", err));
    std::string line;
    while (std::getline(f, line)) {
      auto t = line.find('\t');
      if (t == std::string::npos) continue;
      std::string key = line.substr(0, t), val = line.substr(t + 1);
      if (key == "variant") be->variant_ = val;
      else if (key == "image_size") be->image_size_ = std::stoi(val);
      else if (key == "buckets") {
        std::stringstream bs(val);
        std::string tok;
        while (std::getline(bs, tok, ','))
          be->buckets_.push_back(std::stoi(tok));
      } else if (key == "amg") {
        auto c = val.find(':');
        if (c != std::string::npos) {
          be->amg_grid_ = std::stoi(val.substr(0, c));
          be->amg_masks_ = std::stoi(val.substr(c + 1));
        }
      } else if (key == "batch") {
        std::stringstream bs(val);
        std::string tok;
        while (std::getline(bs, tok, ','))
          if (!tok.empty()) be->batch_sizes_.push_back(std::stoi(tok));
        std::sort(be->batch_sizes_.begin(), be->batch_sizes_.end());
      } else if (key == "birefnet") {
        // kind:bucket:resolution, comma-separated
        std::stringstream bs(val);
        std::string tok;
        while (std::getline(bs, tok, ',')) {
          auto c1 = tok.find(':');
          auto c2 = tok.find(':', c1 + 1);
          if (c1 == std::string::npos || c2 == std::string::npos) continue;
          BirefProgram p;
          p.kind = tok.substr(0, c1);
          p.bucket = std::stoi(tok.substr(c1 + 1, c2 - c1 - 1));
          p.resolution = std::stoi(tok.substr(c2 + 1));
          be->birefnet_.push_back(p);
        }
      }
    }
    if (be->buckets_.empty()) {
      if (err) *err = "serving.txt missing/empty (run tools/aot_export.py "
                      "--program serving)";
      return nullptr;
    }
  }
  if (err) err->clear();
  return be.release();
}

void destroy(Backend* be) {
  if (!be) return;
  for (auto& kv : be->execs) {
    for (PJRT_Buffer* w : kv.second.weights) {
      PJRT_Buffer_Destroy_Args d{};
      d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      d.buffer = w;
      be->api->PJRT_Buffer_Destroy(&d);
    }
    if (kv.second.exec) {
      PJRT_LoadedExecutable_Destroy_Args d{};
      d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
      d.executable = kv.second.exec;
      be->api->PJRT_LoadedExecutable_Destroy(&d);
    }
  }
  if (be->client) {
    PJRT_Client_Destroy_Args d{};
    d.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
    d.client = be->client;
    be->api->PJRT_Client_Destroy(&d);
  }
  delete be;
}

namespace {

// Copy one host array to the device (blocking until the host buffer may be
// reused — staging copies are small next to the execute itself).
PJRT_Buffer* stage_host(Backend* be, const void* data,
                        const std::vector<int64_t>& dims,
                        const std::string& dtype, std::string* err) {
  PJRT_Client_BufferFromHostBuffer_Args bh{};
  bh.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  bh.client = be->client;
  bh.data = data;
  bh.type = dtype_enum(dtype);
  if (bh.type == PJRT_Buffer_Type_INVALID) {
    if (err) *err = "unsupported dtype " + dtype;
    return nullptr;
  }
  bh.dims = dims.data();
  bh.num_dims = dims.size();
  bh.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  bh.device = be->device;
  if (!check(be->api, be->api->PJRT_Client_BufferFromHostBuffer(&bh), "h2d",
             err))
    return nullptr;
  if (!await_event(be->api, bh.done_with_host_buffer, "h2d done", err))
    return nullptr;
  return bh.buffer;
}

Exec* get_exec(Backend* be, const std::string& name, std::string* err) {
  auto it = be->execs.find(name);
  if (it != be->execs.end()) return &it->second;
  std::string blob = read_file(be->dir + "/" + name + ".pjrt", err);
  if (blob.empty()) return nullptr;
  PJRT_Executable_DeserializeAndLoad_Args dl{};
  dl.struct_size = PJRT_Executable_DeserializeAndLoad_Args_STRUCT_SIZE;
  dl.client = be->client;
  dl.serialized_executable = blob.data();
  dl.serialized_executable_size = blob.size();
  if (!check(be->api, be->api->PJRT_Executable_DeserializeAndLoad(&dl),
             ("deserialize " + name).c_str(), err))
    return nullptr;
  Exec ex;
  ex.exec = dl.loaded_executable;
  // Failure below must not leak: the loaded executable and any weights
  // staged so far are not yet in be->execs (destroy() can't see them), and
  // every retried run() would re-deserialize and re-stage — device memory
  // would ratchet up until OOM.
  auto cleanup = [&]() {
    for (PJRT_Buffer* w : ex.weights) {
      PJRT_Buffer_Destroy_Args d{};
      d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      d.buffer = w;
      be->api->PJRT_Buffer_Destroy(&d);
    }
    PJRT_LoadedExecutable_Destroy_Args d{};
    d.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
    d.executable = ex.exec;
    be->api->PJRT_LoadedExecutable_Destroy(&d);
  };
  PJRT_LoadedExecutable_GetExecutable_Args ge{};
  ge.struct_size = PJRT_LoadedExecutable_GetExecutable_Args_STRUCT_SIZE;
  ge.loaded_executable = ex.exec;
  if (!check(be->api, be->api->PJRT_LoadedExecutable_GetExecutable(&ge),
             "get exec", err)) {
    cleanup();
    return nullptr;
  }
  PJRT_Executable_NumOutputs_Args no{};
  no.struct_size = PJRT_Executable_NumOutputs_Args_STRUCT_SIZE;
  no.executable = ge.executable;
  PJRT_Error* no_err = be->api->PJRT_Executable_NumOutputs(&no);
  // The PJRT_Executable wrapper is only needed for the query; destroy it
  // on every path (the loaded executable is independent of it).
  {
    PJRT_Executable_Destroy_Args d{};
    d.struct_size = PJRT_Executable_Destroy_Args_STRUCT_SIZE;
    d.executable = ge.executable;
    be->api->PJRT_Executable_Destroy(&d);
  }
  if (!check(be->api, no_err, "num outputs", err)) {
    cleanup();
    return nullptr;
  }
  ex.num_outputs = no.num_outputs;

  // <name>.spec.txt (tools/aot_export.py): one line per KEPT argument, in
  // call order — "inw dtype dims" = weight (pre-uploaded here from
  // <name>.in<j>.npy, j = line index), "ind dtype dims" = dynamic (fed per
  // run). Legacy "in dtype dims" specs (smoke/decode exports) have no
  // weights; a missing spec file means the same.
  {
    std::ifstream f(be->dir + "/" + name + ".spec.txt");
    std::string line;
    int j = 0;
    while (f && std::getline(f, line)) {
      if (line.rfind("in", 0) != 0) continue;
      bool is_w = line.size() > 2 && line[2] == 'w';
      ex.is_weight.push_back(is_w);
      if (is_w) {
        Npy npy;
        std::string path =
            be->dir + "/" + name + ".in" + std::to_string(j) + ".npy";
        if (!load_npy(path, &npy, err)) {
          cleanup();
          return nullptr;
        }
        PJRT_Buffer* wb =
            stage_host(be, npy.data.data(), npy.shape, npy.dtype, err);
        if (!wb) {
          if (err) *err = "weight " + path + ": " + *err;
          cleanup();
          return nullptr;
        }
        ex.weights.push_back(wb);
      }
      ++j;
    }
  }
  return &(be->execs[name] = ex);
}

}  // namespace

bool run(Backend* be, const std::string& name, const std::vector<Arg>& args,
         std::vector<Buf*>* outs, std::string* err) {
  std::lock_guard<std::mutex> lk(be->mu);
  Exec* ex = get_exec(be, name, err);
  if (!ex) return false;

  // Interleave the pre-uploaded weight buffers with the caller's dynamic
  // args following the spec's kept-argument order. With no spec (legacy
  // programs) every kept arg is dynamic.
  size_t n_kept = ex->is_weight.empty() ? args.size() : ex->is_weight.size();
  std::vector<PJRT_Buffer*> in_bufs;
  std::vector<PJRT_Buffer*> owned;  // host-staged inputs to destroy after
  bool ok = true;
  size_t wi = 0, di = 0;
  for (size_t k = 0; k < n_kept && ok; ++k) {
    if (!ex->is_weight.empty() && ex->is_weight[k]) {
      in_bufs.push_back(ex->weights[wi++]);
      continue;
    }
    if (di >= args.size()) {
      if (err)
        *err = name + ": spec expects more dynamic args than the " +
               std::to_string(args.size()) + " given";
      ok = false;
      break;
    }
    const Arg& a = args[di++];
    if (a.dev) {
      in_bufs.push_back(a.dev->b);
      continue;
    }
    PJRT_Buffer* hb = stage_host(be, a.host, a.dims, a.dtype, err);
    if (!hb) {
      ok = false;
      break;
    }
    in_bufs.push_back(hb);
    owned.push_back(hb);
  }
  if (ok && di != args.size()) {
    if (err)
      *err = name + ": " + std::to_string(args.size()) +
             " dynamic args given, spec keeps only " + std::to_string(di);
    ok = false;
  }

  std::vector<PJRT_Buffer*> out_bufs(ex->num_outputs, nullptr);
  if (ok) {
    PJRT_ExecuteOptions eo{};
    eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* const* arg_list = in_bufs.data();
    PJRT_Buffer** out_list = out_bufs.data();
    PJRT_Event* done = nullptr;
    PJRT_LoadedExecutable_Execute_Args exa{};
    exa.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    exa.executable = ex->exec;
    exa.options = &eo;
    exa.argument_lists = &arg_list;
    exa.num_devices = 1;
    exa.num_args = in_bufs.size();
    exa.output_lists = &out_list;
    exa.device_complete_events = &done;
    ok = check(be->api, be->api->PJRT_LoadedExecutable_Execute(&exa),
               ("execute " + name).c_str(), err);
    if (ok) ok = await_event(be->api, done, "execute done", err);
  }
  for (PJRT_Buffer* b : owned) {
    PJRT_Buffer_Destroy_Args d{};
    d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    d.buffer = b;
    be->api->PJRT_Buffer_Destroy(&d);
  }
  if (!ok) {
    for (PJRT_Buffer* b : out_bufs) {
      if (!b) continue;
      PJRT_Buffer_Destroy_Args d{};
      d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      d.buffer = b;
      be->api->PJRT_Buffer_Destroy(&d);
    }
    return false;
  }
  outs->clear();
  for (PJRT_Buffer* b : out_bufs) outs->push_back(new Buf{b});
  return true;
}

bool fetch(Backend* be, Buf* buf, void* dst, size_t dst_size,
           std::string* err) {
  std::lock_guard<std::mutex> lk(be->mu);
  PJRT_Buffer_ToHostBuffer_Args th{};
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = buf->b;
  th.dst = dst;
  th.dst_size = dst_size;
  if (!check(be->api, be->api->PJRT_Buffer_ToHostBuffer(&th), "d2h", err))
    return false;
  return await_event(be->api, th.event, "d2h done", err);
}

bool validate(Backend* be, const std::string& name, std::string* report,
              std::string* err, int f32_ulp) {
  // Parse the spec for dynamic-input indices and output shapes.
  std::ifstream f(be->dir + "/" + name + ".spec.txt");
  if (!f) {
    if (err) *err = "no spec for " + name;
    return false;
  }
  std::vector<Arg> args;
  std::vector<Npy> dyn;   // keep data alive for Arg.host pointers
  std::vector<Npy> want;  // expected outputs
  std::string line;
  int j = 0;
  dyn.reserve(64);
  while (std::getline(f, line)) {
    std::istringstream ls(line);
    std::string tag;
    ls >> tag;
    if (tag == "ind") {
      Npy npy;
      std::string path =
          be->dir + "/" + name + ".in" + std::to_string(j) + ".npy";
      if (!load_npy(path, &npy, err)) return false;
      dyn.push_back(std::move(npy));
    }
    if (tag == "inw" || tag == "ind") ++j;
    if (tag == "out") {
      Npy npy;
      std::string path = be->dir + "/" + name + ".out" +
                         std::to_string(want.size()) + ".npy";
      if (!load_npy(path, &npy, err)) return false;
      want.push_back(std::move(npy));
    }
  }
  for (const Npy& d : dyn) {
    Arg a;
    a.host = d.data.data();
    a.dims = d.shape;
    a.dtype = d.dtype;
    args.push_back(a);
  }
  std::vector<Buf*> outs;
  if (!run(be, name, args, &outs, err)) return false;
  if (outs.size() != want.size()) {
    // A stale spec (interrupted export, .pjrt regenerated without its
    // spec) would otherwise index want[] out of bounds below.
    for (Buf* o : outs) release(be, o);
    if (err)
      *err = name + ": executable has " + std::to_string(outs.size()) +
             " outputs but the spec lists " + std::to_string(want.size()) +
             " (stale bundle? re-run tools/aot_export.py)";
    return false;
  }
  // Smallest-output-first fetch (relay first-fetch pathology).
  std::vector<size_t> order(outs.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](size_t a, size_t b) {
    return want[a].data.size() < want[b].data.size();
  });
  bool ok = true;
  std::ostringstream rep;
  std::vector<std::string> got(outs.size());
  for (size_t oi : order) {
    got[oi].resize(want[oi].data.size());
    if (!fetch(be, outs[oi], &got[oi][0], got[oi].size(), err)) {
      ok = false;
      break;
    }
  }
  for (Buf* o : outs) release(be, o);
  if (!ok) return false;
  for (size_t oi = 0; oi < outs.size(); ++oi) {
    size_t n_diff = 0;
    if (f32_ulp > 0 && want[oi].dtype == "float32") {
      // Element-wise ULP compare (monotone int reinterpretation).
      const size_t n = got[oi].size() / 4;
      for (size_t e = 0; e < n; ++e) {
        int32_t a, b;
        std::memcpy(&a, got[oi].data() + 4 * e, 4);
        std::memcpy(&b, want[oi].data.data() + 4 * e, 4);
        // Monotone int mapping of float bits (negatives mirrored below
        // zero; +-0 coincide), so |key(a)-key(b)| is the ULP distance.
        auto key = [](int32_t v) -> int64_t {
          return v >= 0 ? int64_t(v) : int64_t(INT32_MIN) - int64_t(v);
        };
        int64_t d = key(a) - key(b);
        n_diff += (d > f32_ulp || d < -f32_ulp);
      }
      rep << name << " out" << oi << ": " << n_diff << "/" << n
          << " f32 elements beyond " << f32_ulp << " ulp\n";
    } else {
      for (size_t b = 0; b < got[oi].size(); ++b)
        n_diff += got[oi][b] != want[oi].data[b];
      rep << name << " out" << oi << ": " << n_diff << "/" << got[oi].size()
          << " bytes differ\n";
    }
    if (n_diff != 0) {
      ok = false;
      // Dump for offline analysis (raw bytes; dtype/shape in the spec).
      std::ofstream g(be->dir + "/" + name + ".got" + std::to_string(oi) +
                          ".bin",
                      std::ios::binary);
      g.write(got[oi].data(), got[oi].size());
    }
  }
  if (report) *report = rep.str();
  if (!ok && err) *err = "output mismatch (see report)";
  return ok;
}

void release(Backend* be, Buf* buf) {
  if (!buf) return;
  PJRT_Buffer_Destroy_Args d{};
  d.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
  d.buffer = buf->b;
  be->api->PJRT_Buffer_Destroy(&d);
  delete buf;
}

}  // namespace dlimg_pjrt
