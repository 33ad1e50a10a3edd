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

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <dlimgedit/detail/dlimgedit.h>

#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>

#include "codecs.hpp"

namespace {

thread_local std::string g_last_error;

void set_error(std::string msg) { g_last_error = std::move(msg); }

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
    PyObject* obj;
};
struct dlimg_Segmentation_ {
    PyObject* obj;
    int width;
    int height;
};

namespace {

// ---------------------------------------------------------------------------
// API entries
// ---------------------------------------------------------------------------

int api_is_backend_supported(dlimg_Backend backend) {
    if (!PyRuntime::get().ensure()) return 0;
    Gil gil;
    PyObject* r = bridge_call("backend_supported",
                              Py_BuildValue("(i)", int(backend)));
    if (!r) return 0;
    int ok = PyObject_IsTrue(r);
    Py_DECREF(r);
    return ok;
}

dlimg_Result api_create_environment(dlimg_Environment* out,
                                    dlimg_Options const* opts) {
    if (!PyRuntime::get().ensure()) return dlimg_error;
    Gil gil;
    PyObject* r = bridge_call(
        "create_environment",
        Py_BuildValue("(is)", int(opts->backend),
                      opts->model_directory ? opts->model_directory : "models"));
    if (!r) return dlimg_error;
    *out = new dlimg_Environment_{r};
    return dlimg_success;
}

void api_destroy_environment(dlimg_Environment env) {
    if (!env) return;
    {
        Gil gil;
        Py_XDECREF(env->obj);
    }
    delete env;
}

dlimg_Result api_process(dlimg_Segmentation* out, dlimg_ImageView const* img,
                         dlimg_Environment env) {
    Gil gil;
    PyObject* r = bridge_call(
        "process",
        Py_BuildValue("(OKiiii)", env->obj, (unsigned long long)(uintptr_t)img->pixels,
                      img->width, img->height, img->channels, img->stride));
    if (!r) return dlimg_error;
    *out = new dlimg_Segmentation_{r, img->width, img->height};
    return dlimg_success;
}

dlimg_Result api_get_mask(dlimg_Segmentation seg, int const* point,
                          int const* region, uint8_t** out_masks,
                          float* out_accuracies) {
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
}

void api_get_extent(dlimg_Segmentation seg, int* out_extent) {
    out_extent[0] = seg->width;
    out_extent[1] = seg->height;
}

void api_destroy_segmentation(dlimg_Segmentation seg) {
    if (!seg) return;
    {
        Gil gil;
        Py_XDECREF(seg->obj);
    }
    delete seg;
}

dlimg_Result api_segment_objects(dlimg_ImageView const* img, uint8_t* out_mask,
                                 dlimg_Environment env) {
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
}

dlimg_Result api_load_image(char const* filepath, int* out_extent,
                            int* out_channels, uint8_t** out_pixels) {
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
}

dlimg_Result api_save_image(dlimg_ImageView const* img, char const* filepath) {
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
};

}  // namespace

extern "C" DLIMG_API dlimg_Api const* dlimg_init(void) { return &api_table; }
