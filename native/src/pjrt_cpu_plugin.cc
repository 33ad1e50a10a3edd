// CPU PJRT C-API plugin: GetPjrtApi over libtensorflow_cc's XLA:CPU client.
//
// Purpose: hermetic validation of the Python-free serving runner
// (pjrt_backend.cpp). No CPU PJRT C-API plugin ships in this image (the
// axon TPU plugin is the only GetPjrtApi exporter; jaxlib embeds XLA:CPU
// without the C API), but the tensorflow pip wheel exports the whole
// xla::PjRtClient C++ surface from libtensorflow_cc.so.2 — including
// xla::GetXlaPjrtCpuClient and PjRtCpuClient::LoadSerializedExecutable,
// which (verified) deserializes executables serialized by jaxlib's
// XLA:CPU. This file wraps exactly the C-API subset pjrt_backend.cpp
// calls; every other PJRT_Api entry is a loud Unimplemented error.
//
// This is a TEST-TIER backend (CI, dead-relay sessions): correctness
// mirrors XLA:CPU; no claim is made about performance. The serving
// deployment target remains the real accelerator plugin.
//
// Reference parity note: the upstream project needs no analog — its ORT
// session runs on CPU out of the box (/root/reference/src/session.hpp).
// This plugin is what gives OUR native serving stack the same
// "runs-anywhere, testable-everywhere" property.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <future>
#include <memory>
#include <new>
#include <optional>
#include <string>
#include <utility>
#include <vector>

#include "xla/hlo/builder/xla_computation.h"
#include "xla/pjrt/pjrt_client.h"
#include "xla/service/hlo.pb.h"
#include "xla/pjrt/plugin/xla_cpu/xla_cpu_pjrt_client.h"
#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

// ---- opaque C-API structs (this .so owns their definitions) --------------

struct PJRT_Error {
  absl::Status status;
  std::string message;  // stable storage for PJRT_Error_Message
};

struct PJRT_Device {
  xla::PjRtDevice* device = nullptr;  // owned by the client
};

struct PJRT_Client {
  std::unique_ptr<xla::PjRtClient> client;
  std::vector<PJRT_Device> devices;        // stable storage
  std::vector<PJRT_Device*> device_ptrs;   // what AddressableDevices returns
};

struct PJRT_Event {
  xla::Future<> future;
};

struct PJRT_Buffer {
  std::unique_ptr<xla::PjRtBuffer> buffer;
};

struct PJRT_LoadedExecutable {
  std::unique_ptr<xla::PjRtLoadedExecutable> exec;
};

struct PJRT_Executable {
  // Non-owning view (PjRtLoadedExecutable::GetExecutable returns an
  // unowned pointer tied to the loaded executable's lifetime).
  const xla::PjRtExecutable* exec = nullptr;
};

namespace {

PJRT_Error* make_error(absl::Status s) {
  if (s.ok()) return nullptr;
  auto* e = new PJRT_Error;
  e->message = s.ToString();
  e->status = std::move(s);
  return e;
}

PJRT_Error* unimplemented(const char* what) {
  return make_error(absl::UnimplementedError(
      std::string("dlimg CPU PJRT plugin: ") + what +
      " is not implemented (test-tier plugin; see pjrt_cpu_plugin.cc)"));
}

absl::StatusOr<xla::PrimitiveType> to_primitive(PJRT_Buffer_Type t) {
  switch (t) {
    case PJRT_Buffer_Type_PRED: return xla::PRED;
    case PJRT_Buffer_Type_S8:   return xla::S8;
    case PJRT_Buffer_Type_S16:  return xla::S16;
    case PJRT_Buffer_Type_S32:  return xla::S32;
    case PJRT_Buffer_Type_S64:  return xla::S64;
    case PJRT_Buffer_Type_U8:   return xla::U8;
    case PJRT_Buffer_Type_U16:  return xla::U16;
    case PJRT_Buffer_Type_U32:  return xla::U32;
    case PJRT_Buffer_Type_U64:  return xla::U64;
    case PJRT_Buffer_Type_F16:  return xla::F16;
    case PJRT_Buffer_Type_F32:  return xla::F32;
    case PJRT_Buffer_Type_F64:  return xla::F64;
    case PJRT_Buffer_Type_BF16: return xla::BF16;
    default:
      return absl::InvalidArgumentError("unsupported PJRT_Buffer_Type " +
                                        std::to_string(int(t)));
  }
}

absl::StatusOr<xla::PjRtClient::HostBufferSemantics> to_semantics(
    PJRT_HostBufferSemantics s) {
  switch (s) {
    case PJRT_HostBufferSemantics_kImmutableOnlyDuringCall:
      return xla::PjRtClient::HostBufferSemantics::kImmutableOnlyDuringCall;
    case PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes:
      return xla::PjRtClient::HostBufferSemantics::
          kImmutableUntilTransferCompletes;
    case PJRT_HostBufferSemantics_kImmutableZeroCopy:
    case PJRT_HostBufferSemantics_kMutableZeroCopy:
      // This shim blocks in ClientBufferFromHostBuffer until the host
      // buffer is reusable (it returns an already-ready done event).
      // Zero-copy aliasing would defer on_done until buffer destruction
      // and deadlock that wait, so honor the caller's stronger validity
      // promise with a plain copy — always legal, never aliases.
      return xla::PjRtClient::HostBufferSemantics::
          kImmutableUntilTransferCompletes;
    default:
      return absl::InvalidArgumentError("unsupported host buffer semantics");
  }
}

// ---- error ---------------------------------------------------------------

void ErrorDestroy(PJRT_Error_Destroy_Args* a) { delete a->error; }

void ErrorMessage(PJRT_Error_Message_Args* a) {
  a->message = a->error->message.c_str();
  a->message_size = a->error->message.size();
}

PJRT_Error* ErrorGetCode(PJRT_Error_GetCode_Args* a) {
  a->code = static_cast<PJRT_Error_Code>(a->error->status.code());
  return nullptr;
}

// ---- plugin / client -----------------------------------------------------

PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) { return nullptr; }

PJRT_Error* ClientCreate(PJRT_Client_Create_Args* a) {
  xla::CpuClientOptions opts;
  opts.cpu_device_count = 1;
  for (size_t i = 0; i < a->num_options; ++i) {
    const PJRT_NamedValue& nv = a->create_options[i];
    if (nv.type == PJRT_NamedValue_kInt64 &&
        std::string(nv.name, nv.name_size) == "cpu_device_count")
      opts.cpu_device_count = static_cast<int>(nv.int64_value);
    // Every other option is accelerator-specific; ignore.
  }
  auto client = xla::GetXlaPjrtCpuClient(std::move(opts));
  if (!client.ok()) return make_error(client.status());
  auto* c = new PJRT_Client;
  c->client = std::move(*client);
  for (xla::PjRtDevice* d : c->client->addressable_devices())
    c->devices.push_back(PJRT_Device{d});
  for (auto& d : c->devices) c->device_ptrs.push_back(&d);
  a->client = c;
  return nullptr;
}

PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args* a) {
  delete a->client;
  return nullptr;
}

PJRT_Error* ClientAddressableDevices(PJRT_Client_AddressableDevices_Args* a) {
  a->addressable_devices = a->client->device_ptrs.data();
  a->num_addressable_devices = a->client->device_ptrs.size();
  return nullptr;
}

PJRT_Error* ClientBufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args* a) {
  auto type = to_primitive(a->type);
  if (!type.ok()) return make_error(type.status());
  auto sem = to_semantics(a->host_buffer_semantics);
  if (!sem.ok()) return make_error(sem.status());
  xla::PjRtDevice* dev = a->device ? a->device->device
                                   : a->client->devices.at(0).device;
  auto memspace = dev->default_memory_space();
  if (!memspace.ok()) return make_error(memspace.status());
  std::optional<absl::Span<const int64_t>> strides;
  if (a->num_byte_strides)
    strides.emplace(a->byte_strides, a->num_byte_strides);
  // Block until the host buffer is reusable, then hand back an
  // already-ready done event (pjrt_backend.cpp awaits it immediately;
  // staging copies are small next to the execute). The promise is
  // shared-owned by the callback: on a failed BufferFromHostBuffer the
  // callback may fire late (or never) and must not reference the stack.
  auto done = std::make_shared<std::promise<void>>();
  auto buf = a->client->client->BufferFromHostBuffer(
      a->data, *type, absl::Span<const int64_t>(a->dims, a->num_dims),
      strides, *sem, [done]() { done->set_value(); }, *memspace,
      /*device_layout=*/nullptr);
  if (!buf.ok()) return make_error(buf.status());
  done->get_future().wait();
  a->buffer = new PJRT_Buffer{std::move(*buf)};
  a->done_with_host_buffer = new PJRT_Event{xla::Future<>(absl::OkStatus())};
  return nullptr;
}

// ---- executables ----------------------------------------------------------

// Newer XLA (jaxlib 0.9) emits layouts whose minor_to_major omits
// degenerate (size-1) dimensions — e.g. {1,0} on f32[1,1,320,256]. This
// older XLA's validator requires |minor_to_major| == rank. Replacing such
// layouts with the default descending layout is byte-identical whenever
// the omitted dims have size 1 (a size-1 dim contributes nothing to the
// linearization), which is the only form the newer emitter produces.
void fix_shape_layout(xla::ShapeProto* s) {
  for (auto& t : *s->mutable_tuple_shapes()) fix_shape_layout(&t);
  if (!s->has_layout()) return;
  auto* layout = s->mutable_layout();
  const int rank = s->dimensions_size();
  if (layout->minor_to_major_size() == rank) return;
  layout->clear_minor_to_major();
  for (int d = rank - 1; d >= 0; --d) layout->add_minor_to_major(d);
}

void fix_program_shape(xla::ProgramShapeProto* ps) {
  for (auto& p : *ps->mutable_parameters()) fix_shape_layout(&p);
  fix_shape_layout(ps->mutable_result());
}

void fix_short_layouts(xla::HloModuleProto* m) {
  if (m->has_host_program_shape())
    fix_program_shape(m->mutable_host_program_shape());
  for (auto& comp : *m->mutable_computations()) {
    if (comp.has_program_shape())
      fix_program_shape(comp.mutable_program_shape());
    for (auto& inst : *comp.mutable_instructions()) {
      if (inst.has_shape()) fix_shape_layout(inst.mutable_shape());
      // Literal shapes must stay consistent with their payload order.
      if (inst.has_literal() && inst.mutable_literal()->has_shape())
        fix_shape_layout(inst.mutable_literal()->mutable_shape());
    }
  }
}

PJRT_Error* ExecutableDeserializeAndLoad(
    PJRT_Executable_DeserializeAndLoad_Args* a) {
  absl::string_view blob(a->serialized_executable,
                         a->serialized_executable_size);
  // CPU-tier bundles ship "DLIMGHLO1" + HloModuleProto and are compiled
  // HERE, by this library's own XLA. Serialized-executable blobs from a
  // different XLA build are NOT version-stable: jaxlib-serialized CPU
  // executables deserialize in this older XLA and then misread the buffer
  // assignment (measured: correct f32 matmul, garbage for multi-output /
  // u8 / bf16 programs). Compiling from HLO removes the skew; HLO protos
  // are stable across these versions (byte-exact on the full matrix).
  constexpr absl::string_view kHloMagic = "DLIMGHLO1";
  if (blob.substr(0, kHloMagic.size()) == kHloMagic) {
    xla::HloModuleProto proto;
    if (!proto.ParseFromArray(blob.data() + kHloMagic.size(),
                              static_cast<int>(blob.size() -
                                               kHloMagic.size())))
      return make_error(
          absl::InvalidArgumentError("DLIMGHLO1 blob: HloModuleProto parse "
                                     "failed"));
    fix_short_layouts(&proto);
    auto exec = a->client->client->CompileAndLoad(
        xla::XlaComputation(std::move(proto)), xla::CompileOptions());
    if (!exec.ok()) return make_error(exec.status());
    a->loaded_executable = new PJRT_LoadedExecutable{std::move(*exec)};
    return nullptr;
  }
  auto exec = a->client->client->LoadSerializedExecutable(
      blob, std::nullopt, xla::LoadOptions());
  if (!exec.ok()) return make_error(exec.status());
  a->loaded_executable = new PJRT_LoadedExecutable{std::move(*exec)};
  return nullptr;
}

PJRT_Error* LoadedExecutableDestroy(PJRT_LoadedExecutable_Destroy_Args* a) {
  delete a->executable;
  return nullptr;
}

PJRT_Error* LoadedExecutableGetExecutable(
    PJRT_LoadedExecutable_GetExecutable_Args* a) {
  a->executable =
      new PJRT_Executable{a->loaded_executable->exec->GetExecutable()};
  return nullptr;
}

PJRT_Error* ExecutableDestroy(PJRT_Executable_Destroy_Args* a) {
  delete a->executable;  // wrapper only; the loaded executable owns the impl
  return nullptr;
}

PJRT_Error* ExecutableNumOutputs(PJRT_Executable_NumOutputs_Args* a) {
  auto types = a->executable->exec->GetOutputElementTypes();
  if (!types.ok()) return make_error(types.status());
  if (types->empty())
    return make_error(absl::InternalError("no output metadata"));
  a->num_outputs = (*types)[0].size();
  return nullptr;
}

PJRT_Error* LoadedExecutableExecute(PJRT_LoadedExecutable_Execute_Args* a) {
  if (a->num_devices != 1)
    return unimplemented("multi-device Execute");
  std::vector<xla::PjRtBuffer*> args;
  args.reserve(a->num_args);
  for (size_t i = 0; i < a->num_args; ++i)
    args.push_back(a->argument_lists[0][i]->buffer.get());
  std::vector<std::vector<xla::PjRtBuffer*>> arg_lists;
  arg_lists.push_back(std::move(args));
  xla::ExecuteOptions opts;  // outputs arrive untupled (one buffer per leaf)
  if (a->options) opts.launch_id = a->options->launch_id;
  std::optional<std::vector<xla::Future<>>> futures;
  if (a->device_complete_events) futures.emplace();
  auto results = a->executable->exec->Execute(arg_lists, opts, futures);
  if (!results.ok()) return make_error(results.status());
  std::vector<std::unique_ptr<xla::PjRtBuffer>>& outs = (*results)[0];
  if (getenv("DLIMG_PJRT_CPU_DEBUG"))
    std::fprintf(stderr, "[dlimg_pjrt_cpu] execute: %zu args -> %zu outs\n",
                 a->num_args, outs.size());
  for (size_t i = 0; i < outs.size(); ++i)
    a->output_lists[0][i] = new PJRT_Buffer{std::move(outs[i])};
  if (a->device_complete_events)
    a->device_complete_events[0] = new PJRT_Event{
        futures.has_value() && !futures->empty()
            ? std::move((*futures)[0])
            : xla::Future<>(absl::OkStatus())};
  return nullptr;
}

// ---- buffers / events ------------------------------------------------------

PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* a) {
  delete a->buffer;
  return nullptr;
}

PJRT_Error* BufferToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* a) {
  xla::PjRtBuffer* b = a->src->buffer.get();
  auto size = b->GetOnDeviceSizeInBytes();
  if (!size.ok()) return make_error(size.status());
  if (a->dst == nullptr) {
    // Size query (the real-accelerator plugins this runner targets hang
    // here — supporting it keeps the test tier stricter than the target).
    a->dst_size = *size;
    a->event = nullptr;
    return nullptr;
  }
  size_t n = a->dst_size < *size ? a->dst_size : *size;
  a->event = new PJRT_Event{b->CopyRawToHost(a->dst, 0, n)};
  return nullptr;
}

PJRT_Error* EventAwait(PJRT_Event_Await_Args* a) {
  return make_error(a->event->future.Await());
}

PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args* a) {
  delete a->event;
  return nullptr;
}

}  // namespace

extern "C" __attribute__((visibility("default"))) const PJRT_Api*
GetPjrtApi() {
  static PJRT_Api api = [] {
    PJRT_Api a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Api_STRUCT_SIZE;
    a.pjrt_api_version.struct_size = PJRT_Api_Version_STRUCT_SIZE;
    a.pjrt_api_version.major_version = PJRT_API_MAJOR;
    a.pjrt_api_version.minor_version = PJRT_API_MINOR;
    a.PJRT_Error_Destroy = ErrorDestroy;
    a.PJRT_Error_Message = ErrorMessage;
    a.PJRT_Error_GetCode = ErrorGetCode;
    a.PJRT_Plugin_Initialize = PluginInitialize;
    a.PJRT_Client_Create = ClientCreate;
    a.PJRT_Client_Destroy = ClientDestroy;
    a.PJRT_Client_AddressableDevices = ClientAddressableDevices;
    a.PJRT_Client_BufferFromHostBuffer = ClientBufferFromHostBuffer;
    a.PJRT_Executable_DeserializeAndLoad = ExecutableDeserializeAndLoad;
    a.PJRT_Executable_Destroy = ExecutableDestroy;
    a.PJRT_Executable_NumOutputs = ExecutableNumOutputs;
    a.PJRT_LoadedExecutable_Destroy = LoadedExecutableDestroy;
    a.PJRT_LoadedExecutable_GetExecutable = LoadedExecutableGetExecutable;
    a.PJRT_LoadedExecutable_Execute = LoadedExecutableExecute;
    a.PJRT_Buffer_Destroy = BufferDestroy;
    a.PJRT_Buffer_ToHostBuffer = BufferToHostBuffer;
    a.PJRT_Event_Await = EventAwait;
    a.PJRT_Event_Destroy = EventDestroy;
    return a;
  }();
  return &api;
}
