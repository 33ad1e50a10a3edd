// dlimgedit_tpu C ABI implementation.
//
// The rebuild's counterpart of the reference's src/dlimgedit.cpp: implements
// the dlimg_Api function table, but instead of ONNX Runtime sessions it
// drives the JAX/XLA TPU runtime through an embedded CPython interpreter
// (dlimgedit_tpu.native_bridge). All heavy work — fused preprocessing,
// encoder/decoder execution, postprocessing — happens inside jitted XLA
// programs on the device; this layer only marshals pointers and errors.
//
// Error model mirrors the reference (dlimgedit.cpp:26-40): every fallible
// entry traps exceptions into an error code + thread-local message.
//
// Works both as a standalone embedder (initialises Python on first use) and
// when loaded into an existing Python process (tests load it via ctypes).

// Serving mode (SURVEY §7 step 5): when DLIMG_PJRT_BUNDLE points at a
// directory produced by `tools/aot_export.py --program serving`, the hot
// path (process / compute_mask / compute_masks) runs through the PJRT C
// API with NO Python in the process (pjrt_backend.cpp); the embedded
// interpreter below is then only touched by segment_objects and exotic
// codec fallbacks.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <dlimgedit/detail/dlimgedit.h>

#include <sys/stat.h>

#include <algorithm>
#include <cstdlib>
#include <cstring>
#include <exception>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <vector>

#include "codecs.hpp"
#include "pjrt_backend.hpp"

// native/src/hostops.cpp (compiled into this library too): the
// channel-map pack shared with the Python fast path.
extern "C" void dlimg_hostops_pack_rgb(const uint8_t* src,
                                       int64_t src_stride, int h, int w,
                                       int src_c, int m0, int m1, int m2,
                                       uint8_t* dst, int64_t dst_stride,
                                       int threads);
extern "C" void dlimg_hostops_resize_mask_box(const uint8_t* src, int src_h,
                                              int src_w, int64_t src_stride,
                                              uint8_t* dst, int dst_h,
                                              int dst_w, int64_t dst_stride);

namespace {

thread_local std::string g_last_error;

void set_error(std::string msg) { g_last_error = std::move(msg); }

// Exception -> error-code bridge (the reference's try_, dlimgedit.cpp:31-40):
// nothing may throw across the extern-C function table — a std::stoi on a
// corrupt serving.txt or a bad_alloc in a codec would otherwise terminate
// the embedding process.
template <typename F>
dlimg_Result try_(F&& f) {
    try {
        return f();
    } catch (std::exception const& e) {
        set_error(e.what());
        return dlimg_error;
    } catch (...) {
        set_error("unknown C++ exception");
        return dlimg_error;
    }
}

// ---------------------------------------------------------------------------
// Embedded interpreter management
// ---------------------------------------------------------------------------

struct PyRuntime {
    PyObject* bridge = nullptr;  // dlimgedit_tpu.native_bridge module
    bool owns_interpreter = false;

    static PyRuntime& get() {
        static PyRuntime rt;
        return rt;
    }

    bool ensure() {
        static std::once_flag once;
        static bool ok = false;
        std::call_once(once, [this] {
            if (!Py_IsInitialized()) {
                Py_InitializeEx(0);
                owns_interpreter = true;
            }
            PyGILState_STATE gil = PyGILState_Ensure();
            bridge = PyImport_ImportModule("dlimgedit_tpu.native_bridge");
            if (!bridge) {
                PyObject *type, *value, *tb;
                PyErr_Fetch(&type, &value, &tb);
                PyObject* s = value ? PyObject_Str(value) : nullptr;
                set_error(std::string("failed to import dlimgedit_tpu: ") +
                          (s ? PyUnicode_AsUTF8(s) : "unknown"));
                Py_XDECREF(s);
                Py_XDECREF(type);
                Py_XDECREF(value);
                Py_XDECREF(tb);
            }
            PyGILState_Release(gil);
            if (owns_interpreter) {
                // Release the GIL acquired by Py_Initialize so other threads
                // (and PyGILState_Ensure below) can take it.
                PyEval_SaveThread();
            }
            ok = bridge != nullptr;
        });
        return ok;
    }
};

struct Gil {
    PyGILState_STATE state;
    Gil() : state(PyGILState_Ensure()) {}
    ~Gil() { PyGILState_Release(state); }
};

// Capture the current Python exception into last_error.
void capture_py_error() {
    PyObject *type, *value, *tb;
    PyErr_Fetch(&type, &value, &tb);
    PyErr_NormalizeException(&type, &value, &tb);
    PyObject* s = value ? PyObject_Str(value) : nullptr;
    set_error(s && PyUnicode_Check(s) ? PyUnicode_AsUTF8(s)
                                      : "unknown Python error");
    Py_XDECREF(s);
    Py_XDECREF(type);
    Py_XDECREF(value);
    Py_XDECREF(tb);
}

// Call bridge.<fn>(args...) -> new reference or nullptr (error captured).
PyObject* bridge_call(char const* fn, PyObject* args /* steals */) {
    PyRuntime& rt = PyRuntime::get();
    PyObject* callable = PyObject_GetAttrString(rt.bridge, fn);
    if (!callable) {
        Py_XDECREF(args);
        capture_py_error();
        return nullptr;
    }
    PyObject* result = PyObject_CallObject(callable, args);
    Py_DECREF(callable);
    Py_XDECREF(args);
    if (!result) capture_py_error();
    return result;
}

}  // namespace

// ---------------------------------------------------------------------------
// Handles (complete the opaque types from the header, at global scope)
// ---------------------------------------------------------------------------

struct dlimg_Environment_ {
    PyObject* obj = nullptr;                 // embedded-Python mode
    dlimg_pjrt::Backend* pjrt = nullptr;     // native serving mode
};
struct dlimg_Segmentation_ {
    PyObject* obj = nullptr;
    int width = 0;
    int height = 0;
    // native serving mode state (the on-device embedding is the cache):
    dlimg_pjrt::Backend* pjrt = nullptr;
    dlimg_pjrt::Buf* emb = nullptr;
    int bucket = 0;
    double scale = 1.0;  // double: mirrors resize.py's Python-float rounding
    int crop_h = 0;
    int crop_w = 0;
};

namespace {

// ---------------------------------------------------------------------------
// Native serving mode (PJRT C API, no Python on the hot path)
// ---------------------------------------------------------------------------

// Pooled per-bucket staging canvas, NOT re-zeroed between calls — the
// device programs mask stale bytes via the resampling matrices, the same
// guarantee the Python hot path relies on (ops/preprocess.staging_canvas,
// "pooled no-zero staging canvases"). A fresh 3 MB alloc + memset per call
// would roughly double the measured ~0.85 ms pack budget.
std::vector<uint8_t>& staging_canvas(int bucket) {
    thread_local std::map<int, std::vector<uint8_t>> pool;
    auto& c = pool[bucket];
    c.resize(size_t(bucket) * bucket * 3);  // zero-fills on FIRST use only
    return c;
}

// Channel-index maps, mirroring dlimgedit_tpu.types.RGB_CHANNEL_MAP
// (create_image_tensor, reference segmentation.cpp:81-97).
void rgb_map(int channels, int* c, int m[3]) {
    switch (channels) {
        case 1: *c = 1; m[0] = m[1] = m[2] = 0; break;           // mask
        case 3: *c = 3; m[0] = 0; m[1] = 1; m[2] = 2; break;     // rgb
        case 4: *c = 4; m[0] = 0; m[1] = 1; m[2] = 2; break;     // rgba
        case 5: *c = 4; m[0] = 2; m[1] = 1; m[2] = 0; break;     // bgra
        default: *c = 4; m[0] = 1; m[1] = 2; m[2] = 3; break;    // argb
    }
}

dlimg_Result pjrt_process(dlimg_Segmentation* out, dlimg_ImageView const* img,
                          dlimg_Environment env) {
    auto* be = env->pjrt;
    int w = img->width, h = img->height;
    int bucket = 0;
    for (int b : dlimg_pjrt::buckets(be))
        if (std::max(w, h) <= b && (bucket == 0 || b < bucket)) bucket = b;
    if (bucket == 0) {
        set_error("image " + std::to_string(w) + "x" + std::to_string(h) +
                  " exceeds every exported canvas bucket (re-run "
                  "tools/aot_export.py --program serving with a larger "
                  "--buckets)");
        return dlimg_error;
    }
    // ResizeLongestSide math (segmentation.cpp:58-74): the device program
    // does the actual resample; the host only computes the target dims.
    double scale = double(dlimg_pjrt::image_size(be)) / double(std::max(w, h));
    int tw = int(w * scale + 0.5);
    int th = int(h * scale + 0.5);

    int c, m[3];
    rgb_map(img->channels, &c, m);
    int64_t stride = img->stride ? img->stride : int64_t(w) * c;
    std::vector<uint8_t>& canvas = staging_canvas(bucket);
    dlimg_hostops_pack_rgb(img->pixels, stride, h, w, c, m[0], m[1], m[2],
                           canvas.data(), int64_t(bucket) * 3, 0);
    int32_t sizes[4] = {h, w, th, tw};

    std::string name = "serve_embed_" + dlimg_pjrt::variant(be) + "_" +
                       std::to_string(bucket);
    std::vector<dlimg_pjrt::Arg> args(2);
    args[0].host = canvas.data();
    args[0].dims = {bucket, bucket, 3};
    args[0].dtype = "uint8";
    args[1].host = sizes;
    args[1].dims = {4};
    args[1].dtype = "int32";
    std::vector<dlimg_pjrt::Buf*> outs;
    std::string err;
    if (!dlimg_pjrt::run(be, name, args, &outs, &err)) {
        set_error(err);
        return dlimg_error;
    }
    if (outs.empty()) {
        set_error(name + ": bundle program returned no outputs (stale or "
                         "mismatched serving bundle)");
        return dlimg_error;
    }
    auto* seg = new dlimg_Segmentation_{};
    seg->width = w;
    seg->height = h;
    seg->pjrt = be;
    seg->emb = outs[0];
    for (size_t i = 1; i < outs.size(); ++i) dlimg_pjrt::release(be, outs[i]);
    seg->bucket = bucket;
    seg->scale = scale;
    seg->crop_h = th;
    seg->crop_w = tw;
    *out = seg;
    return dlimg_success;
}

// Unpack pack_mask_bits rows (MSB-first bytes) into a (h, w) 0/255 mask.
void unpack_mask(const uint8_t* packed, int bucket, int h, int w,
                 uint8_t* dst) {
    int row_bytes = bucket / 8;
    for (int y = 0; y < h; ++y) {
        const uint8_t* row = packed + size_t(y) * row_bytes;
        for (int x = 0; x < w; ++x)
            dst[size_t(y) * w + x] =
                (row[x >> 3] >> (7 - (x & 7))) & 1 ? 255 : 0;
    }
}

// Encode one prompt into the decode-program protocol
// (segmentation.cpp:131-152): point -> (p,1)+(0,-1); box -> (tl,2)+(br,3).
// Coordinates are scaled into canvas space with Python-float rounding.
void encode_prompt(double scale, int const* v, bool is_region,
                   float* pts /*[4]*/, float* lbl /*[2]*/) {
    auto tp = [&](int x) { return float(int(x * scale + 0.5)); };
    if (is_region) {
        pts[0] = tp(v[0]);
        pts[1] = tp(v[1]);
        pts[2] = tp(v[2]);
        pts[3] = tp(v[3]);
        lbl[0] = 2.0f;
        lbl[1] = 3.0f;
    } else {
        pts[0] = tp(v[0]);
        pts[1] = tp(v[1]);
        pts[2] = 0.0f;
        pts[3] = 0.0f;
        lbl[0] = 1.0f;
        lbl[1] = -1.0f;
    }
}

// Run one decode-family program (cached embedding + P prompt slots) and
// fetch its two outputs — per-mask IoUs FIRST (smallest output; the relay's
// first-fetch pathology), then the bit-packed masks in one bulk copy.
// n_masks = mask rows the program produces (1, 3, or the batch size).
dlimg_Result run_decode_fetch(dlimg_Segmentation seg, std::string const& name,
                              float* pts, float* lbl, int64_t slots,
                              int n_masks, std::vector<uint8_t>* packed,
                              std::vector<float>* iou) {
    auto* be = seg->pjrt;
    int32_t sizes[4] = {seg->height, seg->width, seg->crop_h, seg->crop_w};
    std::vector<dlimg_pjrt::Arg> args(4);
    args[0].dev = seg->emb;
    args[1].host = pts;
    args[1].dims = {slots, 2, 2};
    args[1].dtype = "float32";
    args[2].host = lbl;
    args[2].dims = {slots, 2};
    args[2].dtype = "float32";
    args[3].host = sizes;
    args[3].dims = {4};
    args[3].dtype = "int32";
    std::vector<dlimg_pjrt::Buf*> outs;
    std::string err;
    if (!dlimg_pjrt::run(be, name, args, &outs, &err)) {
        set_error(err);
        return dlimg_error;
    }
    if (outs.size() < 2) {  // packed masks + iou expected
        for (auto* o : outs) dlimg_pjrt::release(be, o);
        set_error(name + ": decode program returned " +
                  std::to_string(outs.size()) + " outputs, expected 2 "
                  "(stale or mismatched serving bundle)");
        return dlimg_error;
    }
    size_t row_bytes = size_t(seg->bucket) / 8;
    packed->resize(size_t(n_masks) * seg->bucket * row_bytes);
    iou->resize(size_t(n_masks));
    bool ok = dlimg_pjrt::fetch(be, outs[1], iou->data(),
                                iou->size() * sizeof(float), &err) &&
              dlimg_pjrt::fetch(be, outs[0], packed->data(), packed->size(),
                                &err);
    for (auto* o : outs) dlimg_pjrt::release(be, o);
    if (!ok) {
        set_error(err);
        return dlimg_error;
    }
    return dlimg_success;
}

dlimg_Result pjrt_get_mask(dlimg_Segmentation seg, int const* point,
                           int const* region, uint8_t** out_masks,
                           float* out_accuracies) {
    auto* be = seg->pjrt;
    bool single = out_masks[1] == nullptr;
    float pts[4];
    float lbl[2];
    if (!point && !region) {
        set_error("compute_mask: neither point nor region given");
        return dlimg_error;
    }
    encode_prompt(seg->scale, point ? point : region, region != nullptr,
                  pts, lbl);
    std::string name = (single ? "serve_decode_" : "serve_decode3_") +
                       dlimg_pjrt::variant(be) + "_" +
                       std::to_string(seg->bucket);
    int n_masks = single ? 1 : 3;
    std::vector<uint8_t> packed;
    std::vector<float> iou;
    dlimg_Result r = run_decode_fetch(seg, name, pts, lbl, 1, n_masks,
                                      &packed, &iou);
    if (r != dlimg_success) return r;
    size_t row_bytes = size_t(seg->bucket) / 8;
    for (int i = 0; i < n_masks; ++i) {
        unpack_mask(packed.data() + size_t(i) * seg->bucket * row_bytes,
                    seg->bucket, seg->height, seg->width, out_masks[i]);
        if (out_accuracies) out_accuracies[i] = iou[i];
    }
    return dlimg_success;
}

// Batched decode through one serve_decode_batch<nb> program. Prompt i is
// {x,y,_,_} (point) or {x0,y0,x1,y1} (box) per is_region[i]; slots past n
// are padded with the (-1,-1) "no prompt" labels the Python runtime uses
// (runtime/segmentation.py compute_mask_batch).
dlimg_Result pjrt_compute_mask_batch(dlimg_Segmentation seg,
                                     int const* prompts,
                                     int const* is_region, int n,
                                     uint8_t* const* out_masks,
                                     float* out_accuracies) {
    auto* be = seg->pjrt;
    auto const& sizes_avail = dlimg_pjrt::batch_sizes(be);
    if (sizes_avail.empty()) {
        // Bundle exported without --batch-sizes: fall back to one
        // serve_decode_ program per prompt (correct, just not batched).
        for (int i = 0; i < n; ++i) {
            int v[4] = {prompts[4 * i], prompts[4 * i + 1],
                        prompts[4 * i + 2], prompts[4 * i + 3]};
            uint8_t* outs1[3] = {out_masks[i], nullptr, nullptr};
            dlimg_Result r = pjrt_get_mask(
                seg, is_region[i] ? nullptr : v, is_region[i] ? v : nullptr,
                outs1, out_accuracies ? out_accuracies + i : nullptr);
            if (r != dlimg_success) return r;
        }
        return dlimg_success;
    }
    int done = 0;
    while (done < n) {
        int want = n - done;
        // Smallest exported batch size covering the remainder; else the
        // largest (and loop).
        int nb = sizes_avail.back();
        for (int s : sizes_avail)
            if (s >= want) { nb = s; break; }
        int take = std::min(want, nb);
        std::vector<float> pts(size_t(nb) * 4, 0.0f);
        std::vector<float> lbl(size_t(nb) * 2, -1.0f);  // padding: no prompt
        for (int i = 0; i < take; ++i)
            encode_prompt(seg->scale, prompts + size_t(done + i) * 4,
                          is_region[done + i] != 0, pts.data() + 4 * i,
                          lbl.data() + 2 * i);
        std::string name = "serve_decode_batch" + std::to_string(nb) + "_" +
                           dlimg_pjrt::variant(be) + "_" +
                           std::to_string(seg->bucket);
        std::vector<uint8_t> packed;
        std::vector<float> iou;
        dlimg_Result r = run_decode_fetch(seg, name, pts.data(), lbl.data(),
                                          nb, nb, &packed, &iou);
        if (r != dlimg_success) return r;
        size_t row_bytes = size_t(seg->bucket) / 8;
        for (int i = 0; i < take; ++i) {
            unpack_mask(packed.data() + size_t(i) * seg->bucket * row_bytes,
                        seg->bucket, seg->height, seg->width,
                        out_masks[done + i]);
            if (out_accuracies) out_accuracies[done + i] = iou[i];
        }
        done += take;
    }
    return dlimg_success;
}

dlimg_Result pjrt_generate_masks(dlimg_Segmentation seg,
                                 float const* thresholds, int max_out,
                                 uint8_t* const* out_masks,
                                 float* out_accuracies, int* out_count) {
    auto* be = seg->pjrt;
    int K = dlimg_pjrt::amg_masks(be);
    if (K == 0) {
        set_error("generate_masks: serving bundle exported without --amg "
                  "(re-run tools/aot_export.py --program serving --amg "
                  "grid:max_masks)");
        return dlimg_error;
    }
    // Same 5-float traced threshold vector the Python runtime feeds
    // (runtime/amg.py): iou, stability, nms, min/max area fraction.
    float thr[5] = {thresholds[0], thresholds[1], thresholds[2], 0.0f, 1.0f};
    int32_t sizes[4] = {seg->height, seg->width, seg->crop_h, seg->crop_w};
    std::string name = "serve_amg_" + dlimg_pjrt::variant(be) + "_" +
                       std::to_string(seg->bucket);
    std::vector<dlimg_pjrt::Arg> args(3);
    args[0].dev = seg->emb;
    args[1].host = sizes;
    args[1].dims = {4};
    args[1].dtype = "int32";
    args[2].host = thr;
    args[2].dims = {5};
    args[2].dtype = "float32";
    std::vector<dlimg_pjrt::Buf*> outs;
    std::string err;
    if (!dlimg_pjrt::run(be, name, args, &outs, &err)) {
        set_error(err);
        return dlimg_error;
    }
    if (outs.size() < 4) {  // packed masks + score/stability/area expected
        for (auto* o : outs) dlimg_pjrt::release(be, o);
        set_error(name + ": amg program returned " +
                  std::to_string(outs.size()) + " outputs, expected 4 "
                  "(stale or mismatched serving bundle)");
        return dlimg_error;
    }
    size_t row_bytes = size_t(seg->bucket) / 8;
    std::vector<float> score(K);
    std::vector<uint8_t> packed(size_t(K) * seg->bucket * row_bytes);
    // Scores first (smallest fetch; relay first-fetch pathology), then the
    // packed masks in one bulk copy.
    bool ok = dlimg_pjrt::fetch(be, outs[1], score.data(),
                                score.size() * sizeof(float), &err) &&
              dlimg_pjrt::fetch(be, outs[0], packed.data(), packed.size(),
                                &err);
    for (auto* o : outs) dlimg_pjrt::release(be, o);
    if (!ok) {
        set_error(err);
        return dlimg_error;
    }
    int n = 0;
    // Scores are sorted descending; score <= 0 marks unused padding slots.
    while (n < K && n < max_out && score[n] > 0.0f) ++n;
    for (int i = 0; i < n; ++i) {
        unpack_mask(packed.data() + size_t(i) * seg->bucket * row_bytes,
                    seg->bucket, seg->height, seg->width, out_masks[i]);
        if (out_accuracies) out_accuracies[i] = score[i];
    }
    *out_count = n;
    return dlimg_success;
}

// segment_objects without Python: mirrors runtime/birefnet.py
// birefnet_segment — kind escalation >1536 px (reference
// segmentation.cpp:222-225), canvas pack, the exported BiRefNet program
// (resample + ImageNet normalise + forward + sigmoid->u8 on device), then
// the native box-filter resize back to the original extent.
dlimg_Result pjrt_segment_objects(dlimg_ImageView const* img,
                                  uint8_t* out_mask, dlimg_Environment env) {
    auto* be = env->pjrt;
    auto& progs = dlimg_pjrt::birefnet(be);
    if (progs.empty()) {
        set_error("segment_objects: the serving bundle has no BiRefNet "
                  "program (re-run tools/aot_export.py --program serving "
                  "with --birefnet general:1024)");
        return dlimg_error;
    }
    int w = img->width, h = img->height;
    int side = std::max(w, h);
    const char* want_kind = side > 1536 ? "high_res" : "general";
    // Smallest fitting bucket of the preferred kind; any-kind fallback
    // mirrors the preference-ordered bundle fallback in
    // runtime/birefnet.py BIREFNET_BUNDLES.
    const dlimg_pjrt::BirefProgram* best = nullptr;
    for (auto& p : progs)
        if (p.kind == want_kind && side <= p.bucket &&
            (!best || p.bucket < best->bucket))
            best = &p;
    if (!best)
        for (auto& p : progs)
            if (side <= p.bucket && (!best || p.bucket < best->bucket))
                best = &p;
    if (!best) {
        set_error("segment_objects: image " + std::to_string(w) + "x" +
                  std::to_string(h) + " exceeds every exported BiRefNet "
                  "bucket");
        return dlimg_error;
    }
    int c, m[3];
    rgb_map(img->channels, &c, m);
    int64_t stride = img->stride ? img->stride : int64_t(w) * c;
    std::vector<uint8_t>& canvas = staging_canvas(best->bucket);
    dlimg_hostops_pack_rgb(img->pixels, stride, h, w, c, m[0], m[1], m[2],
                           canvas.data(), int64_t(best->bucket) * 3, 0);
    int32_t sizes[2] = {h, w};
    std::string name = "serve_birefnet_" + best->kind + "_" +
                       std::to_string(best->bucket);
    std::vector<dlimg_pjrt::Arg> args(2);
    args[0].host = canvas.data();
    args[0].dims = {best->bucket, best->bucket, 3};
    args[0].dtype = "uint8";
    args[1].host = sizes;
    args[1].dims = {2};
    args[1].dtype = "int32";
    std::vector<dlimg_pjrt::Buf*> outs;
    std::string err;
    if (!dlimg_pjrt::run(be, name, args, &outs, &err)) {
        set_error(err);
        return dlimg_error;
    }
    if (outs.empty()) {
        set_error(name + ": bundle program returned no outputs (stale or "
                         "mismatched serving bundle)");
        return dlimg_error;
    }
    int S = best->resolution;
    std::vector<uint8_t> model_mask(size_t(S) * S);
    bool ok = dlimg_pjrt::fetch(be, outs[0], model_mask.data(),
                                model_mask.size(), &err);
    for (auto* o : outs) dlimg_pjrt::release(be, o);
    if (!ok) {
        set_error(err);
        return dlimg_error;
    }
    dlimg_hostops_resize_mask_box(model_mask.data(), S, S, S, out_mask, h, w,
                                  w);
    return dlimg_success;
}

// ---------------------------------------------------------------------------
// API entries
// ---------------------------------------------------------------------------

int api_is_backend_supported(dlimg_Backend backend) {
    if (const char* bundle = std::getenv("DLIMG_PJRT_BUNDLE")) {
        // Serving mode answers WITHOUT touching Python: a capability probe
        // must not boot the embedded interpreter (Python-free deployments
        // have no libpython environment — Py_InitializeEx would abort), and
        // it must not boot the PJRT plugin either (plugin init can dial a
        // remote accelerator). Instead, validate the bundle's own metadata:
        // serving.txt records which backend its programs were lowered for,
        // so a CPU-exported or unreadable bundle never reports dlimg_gpu.
        static std::mutex m;
        std::lock_guard<std::mutex> lock(m);
        static std::string cached_key;
        static int cached_backend = -1;  // -1 unprobed, else dlimg_Backend
        // Key the cache on the file's identity, not just the dir string:
        // a bundle re-exported IN PLACE (new serving.txt, same path) must
        // re-probe, or a long-running app reports the old tier forever.
        std::string key = bundle;
        struct stat st;
        if (::stat((std::string(bundle) + "/serving.txt").c_str(), &st) == 0)
            key += "|" + std::to_string(st.st_mtime) + "|" +
                   std::to_string(st.st_size);
        if (cached_key != key || cached_backend < 0) {
            // A FAILED parse is never cached: the app may probe while the
            // bundle is still being exported/synced (serving.txt absent or
            // truncated); once it completes, the next probe must see it.
            cached_key = key;
            cached_backend = -1;
            std::ifstream f(std::string(bundle) + "/serving.txt");
            std::string line;
            bool have_buckets = false;
            int be = dlimg_gpu;  // pre-"backend"-key bundles were gpu-only
            while (std::getline(f, line)) {
                auto t = line.find('\t');
                if (t == std::string::npos) continue;
                std::string key = line.substr(0, t), val = line.substr(t + 1);
                if (key == "buckets" && !val.empty()) have_buckets = true;
                if (key == "backend")
                    be = (val == "cpu") ? dlimg_cpu : dlimg_gpu;
            }
            if (f.eof() && have_buckets) cached_backend = be;
        }
        return cached_backend == int(backend) ? 1 : 0;
    }
    try {
        if (!PyRuntime::get().ensure()) return 0;
        Gil gil;
        PyObject* r = bridge_call("backend_supported",
                                  Py_BuildValue("(i)", int(backend)));
        if (!r) return 0;
        int ok = PyObject_IsTrue(r);
        Py_DECREF(r);
        return ok;
    } catch (...) {
        return 0;
    }
}

dlimg_Result api_create_environment(dlimg_Environment* out,
                                    dlimg_Options const* opts) {
  return try_([&]() -> dlimg_Result {
    if (const char* bundle = std::getenv("DLIMG_PJRT_BUNDLE")) {
        // Native serving mode: the whole public API (process, masks,
        // segment_objects, codecs) runs through the PJRT C API + native
        // codecs; Python stays uninitialised — unrecognised image
        // containers report an error instead of booting the interpreter.
        std::string err;
        dlimg_pjrt::Backend* be = dlimg_pjrt::create(bundle, &err);
        if (!be) {
            set_error("PJRT serving bundle: " + err);
            return dlimg_error;
        }
        auto* env = new dlimg_Environment_{};
        env->pjrt = be;
        *out = env;
        return dlimg_success;
    }
    if (!PyRuntime::get().ensure()) return dlimg_error;
    Gil gil;
    PyObject* r = bridge_call(
        "create_environment",
        Py_BuildValue("(is)", int(opts->backend),
                      opts->model_directory ? opts->model_directory : "models"));
    if (!r) return dlimg_error;
    auto* env = new dlimg_Environment_{};
    env->obj = r;
    *out = env;
    return dlimg_success;
  });
}

void api_destroy_environment(dlimg_Environment env) {
    if (!env) return;
    if (env->obj) {
        Gil gil;
        Py_XDECREF(env->obj);
    }
    dlimg_pjrt::destroy(env->pjrt);
    delete env;
}

dlimg_Result api_process(dlimg_Segmentation* out, dlimg_ImageView const* img,
                         dlimg_Environment env) {
  return try_([&]() -> dlimg_Result {
    if (!out || !img || !env) {  // a null HANDLE is an error, not a segfault
        set_error("process: invalid arguments (null environment/image)");
        return dlimg_error;
    }
    if (env->pjrt) return pjrt_process(out, img, env);
    Gil gil;
    PyObject* r = bridge_call(
        "process",
        Py_BuildValue("(OKiiii)", env->obj, (unsigned long long)(uintptr_t)img->pixels,
                      img->width, img->height, img->channels, img->stride));
    if (!r) return dlimg_error;
    auto* seg = new dlimg_Segmentation_{};
    seg->obj = r;
    seg->width = img->width;
    seg->height = img->height;
    *out = seg;
    return dlimg_success;
  });
}

dlimg_Result api_get_mask(dlimg_Segmentation seg, int const* point,
                          int const* region, uint8_t** out_masks,
                          float* out_accuracies) {
  return try_([&]() -> dlimg_Result {
    if (!seg || !out_masks || (!point && !region)) {
        set_error("compute_mask: invalid arguments (null handle/outputs)");
        return dlimg_error;
    }
    if (seg->pjrt)
        return pjrt_get_mask(seg, point, region, out_masks, out_accuracies);
    Gil gil;
    PyObject* py_point = point ? Py_BuildValue("(ii)", point[0], point[1])
                               : Py_NewRef(Py_None);
    PyObject* py_region =
        region ? Py_BuildValue("(iiii)", region[0], region[1], region[2],
                               region[3])
               : Py_NewRef(Py_None);
    PyObject* ptrs = Py_BuildValue(
        "[KKK]", (unsigned long long)(uintptr_t)out_masks[0],
        (unsigned long long)(uintptr_t)out_masks[1],
        (unsigned long long)(uintptr_t)out_masks[2]);
    PyObject* r = bridge_call(
        "compute_mask",
        Py_BuildValue("(ONNNK)", seg->obj, py_point, py_region, ptrs,
                      (unsigned long long)(uintptr_t)out_accuracies));
    if (!r) return dlimg_error;
    Py_DECREF(r);
    return dlimg_success;
  });
}

dlimg_Result api_compute_mask_batch(dlimg_Segmentation seg,
                                    int const* prompts,
                                    int const* is_region, int n,
                                    uint8_t* const* out_masks,
                                    float* out_accuracies) {
  return try_([&]() -> dlimg_Result {
    if (!seg || !prompts || !is_region || n <= 0 || !out_masks) {
        set_error("compute_mask_batch: invalid arguments");
        return dlimg_error;
    }
    if (seg->pjrt)
        return pjrt_compute_mask_batch(seg, prompts, is_region, n,
                                       out_masks, out_accuracies);
    Gil gil;
    PyObject* py_prompts = PyTuple_New(size_t(n) * 4);
    PyObject* py_isreg = PyTuple_New(n);
    PyObject* ptrs = py_prompts && py_isreg ? PyList_New(n) : nullptr;
    if (!ptrs) {
        PyErr_Clear();
        Py_XDECREF(py_prompts);
        Py_XDECREF(py_isreg);
        set_error("compute_mask_batch: allocation failure");
        return dlimg_error;
    }
    bool ok = true;
    for (int i = 0; ok && i < 4 * n; ++i) {
        PyObject* v = PyLong_FromLong(prompts[i]);
        ok = v != nullptr;
        if (ok) PyTuple_SET_ITEM(py_prompts, i, v);
    }
    for (int i = 0; ok && i < n; ++i) {
        PyObject* v = PyLong_FromLong(is_region[i]);
        PyObject* p = v ? PyLong_FromUnsignedLongLong(
                              (unsigned long long)(uintptr_t)out_masks[i])
                        : nullptr;
        ok = p != nullptr;
        if (!ok) {
            Py_XDECREF(v);
        } else {
            PyTuple_SET_ITEM(py_isreg, i, v);
            PyList_SetItem(ptrs, i, p);
        }
    }
    if (!ok) {
        PyErr_Clear();
        Py_DECREF(py_prompts);
        Py_DECREF(py_isreg);
        Py_DECREF(ptrs);
        set_error("compute_mask_batch: allocation failure");
        return dlimg_error;
    }
    PyObject* r = bridge_call(
        "compute_mask_batch",
        Py_BuildValue("(ONNiNK)", seg->obj, py_prompts, py_isreg, n, ptrs,
                      (unsigned long long)(uintptr_t)out_accuracies));
    if (!r) return dlimg_error;
    Py_DECREF(r);
    return dlimg_success;
  });
}

dlimg_Result api_generate_masks(dlimg_Segmentation seg,
                                float const* thresholds, int max_masks,
                                uint8_t* const* out_masks,
                                float* out_accuracies, int* out_count) {
  return try_([&]() -> dlimg_Result {
    if (!seg || !thresholds || !out_masks || !out_count || max_masks <= 0) {
        set_error("generate_masks: invalid arguments");
        return dlimg_error;
    }
    *out_count = 0;
    if (seg->pjrt)
        return pjrt_generate_masks(seg, thresholds, max_masks, out_masks,
                                   out_accuracies, out_count);
    Gil gil;
    PyObject* ptrs = PyList_New(max_masks);
    if (!ptrs) {
        PyErr_Clear();
        set_error("generate_masks: allocation failure");
        return dlimg_error;
    }
    for (int i = 0; i < max_masks; ++i) {
        PyObject* v = PyLong_FromUnsignedLongLong(
            (unsigned long long)(uintptr_t)out_masks[i]);
        if (!v) {  // PyList_SetItem(NULL) would store a hole / crash later
            PyErr_Clear();
            Py_DECREF(ptrs);
            set_error("generate_masks: allocation failure");
            return dlimg_error;
        }
        PyList_SetItem(ptrs, i, v);
    }
    PyObject* r = bridge_call(
        "generate_masks",
        Py_BuildValue("(OfffiNK)", seg->obj, thresholds[0], thresholds[1],
                      thresholds[2], max_masks, ptrs,
                      (unsigned long long)(uintptr_t)out_accuracies));
    if (!r) return dlimg_error;
    *out_count = (int)PyLong_AsLong(r);
    Py_DECREF(r);
    return dlimg_success;
  });
}

void api_get_extent(dlimg_Segmentation seg, int* out_extent) {
    if (!out_extent) return;
    if (!seg) {  // null handle reports a zero extent, not a segfault
        out_extent[0] = out_extent[1] = 0;
        return;
    }
    out_extent[0] = seg->width;
    out_extent[1] = seg->height;
}

void api_destroy_segmentation(dlimg_Segmentation seg) {
    if (!seg) return;
    if (seg->obj) {
        Gil gil;
        Py_XDECREF(seg->obj);
    }
    if (seg->emb) dlimg_pjrt::release(seg->pjrt, seg->emb);
    delete seg;
}

dlimg_Result api_segment_objects(dlimg_ImageView const* img, uint8_t* out_mask,
                                 dlimg_Environment env) {
  return try_([&]() -> dlimg_Result {
    if (!img || !out_mask || !env) {
        set_error("segment_objects: invalid arguments (null handle/image)");
        return dlimg_error;
    }
    if (env->pjrt) return pjrt_segment_objects(img, out_mask, env);
    Gil gil;
    PyObject* r = bridge_call(
        "run_segment_objects",
        Py_BuildValue("(OKiiiiK)", env->obj,
                      (unsigned long long)(uintptr_t)img->pixels, img->width,
                      img->height, img->channels, img->stride,
                      (unsigned long long)(uintptr_t)out_mask));
    if (!r) return dlimg_error;
    Py_DECREF(r);
    return dlimg_success;
  });
}

dlimg_Result api_load_image(char const* filepath, int* out_extent,
                            int* out_channels, uint8_t** out_pixels) {
  return try_([&]() -> dlimg_Result {
    // Native codec path first (libpng/libjpeg + built-in BMP/TGA): no
    // Python involved, mirroring the reference's stb layer
    // (/root/reference/src/image.cpp:11-23). The bridge remains a fallback
    // for containers the native layer does not handle.
    {
        std::string err;
        int w = 0, h = 0, c = 0;
        uint8_t* px = dlimg_native::load_image(filepath, &w, &h, &c, &err);
        if (px) {
            out_extent[0] = w;
            out_extent[1] = h;
            *out_channels = c;
            *out_pixels = px;
            return dlimg_success;
        }
        if (!err.empty()) {  // recognised format but corrupt/unreadable
            set_error("load_image: " + err);
            return dlimg_error;
        }
    }
    if (std::getenv("DLIMG_PJRT_BUNDLE")) {
        // PJRT serving mode is Python-free by contract: an unrecognised
        // (or magic-stripped corrupt) file must NOT boot an interpreter
        // in the serving process — it reports an error instead. The
        // embedded mode below keeps the PIL fallback for containers the
        // native codecs don't cover (found by the codec fuzz loop in
        // native/test/test_codecs.cpp).
        set_error("load_image: unrecognised image format (native codecs: "
                  "png/jpeg/bmp/tga; the Python codec fallback is disabled "
                  "in PJRT serving mode)");
        return dlimg_error;
    }
    if (!PyRuntime::get().ensure()) return dlimg_error;
    Gil gil;
    PyObject* r = bridge_call("load_image", Py_BuildValue("(s)", filepath));
    if (!r) return dlimg_error;
    int w, h, c;
    PyObject* bytes;
    if (!PyArg_ParseTuple(r, "iiiO", &w, &h, &c, &bytes)) {
        capture_py_error();
        Py_DECREF(r);
        return dlimg_error;
    }
    size_t n = size_t(w) * h * c;
    if (!PyBytes_Check(bytes) || size_t(PyBytes_Size(bytes)) < n) {
        set_error("load_image: pixel buffer shorter than width*height*channels");
        Py_DECREF(r);
        return dlimg_error;
    }
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(n));
    if (!buf) {
        set_error("load_image: allocation failed");
        Py_DECREF(r);
        return dlimg_error;
    }
    std::memcpy(buf, PyBytes_AsString(bytes), n);
    Py_DECREF(r);
    out_extent[0] = w;
    out_extent[1] = h;
    *out_channels = c;
    *out_pixels = buf;
    return dlimg_success;
  });
}

dlimg_Result api_save_image(dlimg_ImageView const* img, char const* filepath) {
  return try_([&]() -> dlimg_Result {
    // Native PNG encoder (libpng) for the reference-supported channel
    // orders mask/rgb/rgba (image.cpp:25-35); bgra/argb and libpng-less
    // builds fall through to the bridge (which also rejects bgra/argb,
    // with a descriptive error).
    if (img->channels == 1 || img->channels == 3 || img->channels == 4) {
        std::string err;
        if (dlimg_native::save_png(filepath, img->pixels, img->width,
                                   img->height, img->channels, img->stride,
                                   &err))
            return dlimg_success;
        if (!err.empty()) {
            set_error("save_image: " + err);
            return dlimg_error;
        }
    }
    if (std::getenv("DLIMG_PJRT_BUNDLE")) {
        // Two distinct failure modes reach here: supported channels but no
        // native encoder compiled in (save_png returns false with err empty
        // when built without libpng), vs a genuinely unsupported channel
        // order. Blame the right one — an operator with a libpng-less build
        // must not be sent off debugging channel layouts.
        if (img->channels == 1 || img->channels == 3 || img->channels == 4)
            set_error("save_image: native PNG encoder unavailable (built "
                      "without libpng); the Python codec fallback is "
                      "disabled in PJRT serving mode");
        else
            set_error("save_image: unsupported channel order for the native "
                      "PNG encoder (mask/rgb/rgba); the Python codec "
                      "fallback is disabled in PJRT serving mode");
        return dlimg_error;
    }
    if (!PyRuntime::get().ensure()) return dlimg_error;
    Gil gil;
    PyObject* r = bridge_call(
        "save_image",
        Py_BuildValue("(Kiiiis)", (unsigned long long)(uintptr_t)img->pixels,
                      img->width, img->height, img->channels, img->stride,
                      filepath));
    if (!r) return dlimg_error;
    Py_DECREF(r);
    return dlimg_success;
  });
}

uint8_t* api_create_image(int width, int height, int channels) {
    int c = channels >= 5 ? 4 : channels;
    return static_cast<uint8_t*>(std::malloc(size_t(width) * height * c));
}

void api_destroy_image(uint8_t const* pixels) {
    std::free(const_cast<uint8_t*>(pixels));
}

char const* api_last_error(void) { return g_last_error.c_str(); }

dlimg_Api const api_table = {
    api_is_backend_supported,
    api_create_environment,
    api_destroy_environment,
    api_process,
    api_get_mask,
    api_get_extent,
    api_destroy_segmentation,
    api_segment_objects,
    api_load_image,
    api_save_image,
    api_create_image,
    api_destroy_image,
    api_last_error,
    api_generate_masks,
    api_compute_mask_batch,
};

}  // namespace

extern "C" DLIMG_API dlimg_Api const* dlimg_init(void) { return &api_table; }
