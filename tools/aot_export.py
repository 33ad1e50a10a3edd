#!/usr/bin/env python
"""Export AOT-compiled executables + client config for the Python-free shim.

SURVEY §7 step 5's preferred design runs the hot Segmentation queries
through the PJRT C API with NO Python on the hot path (the reference ships
a self-contained native .so backed by ONNX Runtime,
/root/reference/src/dlimgedit.cpp:102-117). This tool produces everything
the C side (native/src/pjrt_shim.cpp, native/test/test_pjrt.cpp) needs:

  <out>/client_options.json   — the exact PJRT_Client_Create named values
                                the Python plugin registration uses
                                (captured by wrapping make_c_api_client)
  <out>/plugin_path.txt       — the PJRT plugin .so jax loaded
  <out>/<name>.pjrt           — PJRT_Executable_Serialize bytes per program
  <out>/<name>.spec.json      — input/output shapes + dtypes, in call order
  <out>/<name>.in<i>.npy      — sample inputs
  <out>/<name>.out<i>.npy     — expected outputs (computed through the
                                normal jax path, for numeric validation)

Usage (TPU attached; ~minutes of compile on first run):
    python tools/aot_export.py --out /tmp/dlimg_aot [--program smoke|decode]

`smoke` exports a tiny elementwise+matmul program (spike plumbing test);
`decode` exports the real compute_mask program (mobile_sam, 1024 bucket).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_captured: dict = {}
_plugin_path: list = []


def _capture_client_options():
    """Wrap xla_client.make_c_api_client to record the options dict the
    axon plugin registration passes to PJRT_Client_Create."""
    from jax._src.lib import xla_client

    orig = xla_client.make_c_api_client

    def wrapped(plugin_name, options=None, *a, **k):
        if options:
            _captured.update(dict(options))
        return orig(plugin_name, options, *a, **k)

    xla_client.make_c_api_client = wrapped
    # The library path is recorded by load_pjrt_plugin_dynamically; capture
    # via the pjrt_plugin registry after init instead (see _plugin_so).


def _plugin_so() -> str:
    # The axon sitecustomize exposes the .so path via env or the known
    # install location; prefer the env the register path uses.
    for key in ("AXON_SO_PATH",):
        if os.environ.get(key):
            return os.environ[key]
    cand = "/opt/axon/libaxon_pjrt.so"
    return cand if os.path.exists(cand) else ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--program", default="smoke", choices=["smoke", "decode"])
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    _capture_client_options()
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    flat = {k: v for k, v in _captured.items()
            if isinstance(v, (str, int, float, bool))}
    with open(os.path.join(args.out, "client_options.json"), "w") as f:
        json.dump(flat, f, indent=1)
    # C-parsable form: key \t type \t value (type: s=string, i=int64, b=bool)
    with open(os.path.join(args.out, "client_options.txt"), "w") as f:
        for k, v in flat.items():
            if isinstance(v, bool):
                f.write(f"{k}\tb\t{int(v)}\n")
            elif isinstance(v, int):
                f.write(f"{k}\ti\t{v}\n")
            else:
                f.write(f"{k}\ts\t{v}\n")
    with open(os.path.join(args.out, "plugin_path.txt"), "w") as f:
        f.write(_plugin_so())

    rng = np.random.default_rng(0)

    def export(name, fn, example_inputs):
        placed = [jax.device_put(x, dev) for x in example_inputs]
        lowered = jax.jit(fn).lower(*placed)
        comp = lowered.compile()
        blob = comp._executable.xla_executable.serialize()
        with open(os.path.join(args.out, f"{name}.pjrt"), "wb") as f:
            f.write(blob)
        outs = comp(*placed)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        outs = [np.asarray(o) for o in outs]
        spec = {
            "inputs": [{"shape": list(np.asarray(x).shape),
                        "dtype": str(np.asarray(x).dtype)}
                       for x in example_inputs],
            "outputs": [{"shape": list(o.shape), "dtype": str(o.dtype)}
                        for o in outs],
        }
        with open(os.path.join(args.out, f"{name}.spec.json"), "w") as f:
            json.dump(spec, f, indent=1)
        for i, x in enumerate(example_inputs):
            np.save(os.path.join(args.out, f"{name}.in{i}.npy"),
                    np.asarray(x))
        for i, o in enumerate(outs):
            np.save(os.path.join(args.out, f"{name}.out{i}.npy"), o)
        print(f"exported {name}: {len(blob)} bytes, "
              f"{len(example_inputs)} in / {len(outs)} out", flush=True)

    if args.program == "smoke":
        export("smoke",
               lambda a, b: (jnp.dot(a, b) + 1.0).astype(jnp.float32),
               [rng.standard_normal((128, 128)).astype(np.float32),
                rng.standard_normal((128, 128)).astype(np.float32)])
    else:
        import dlimgedit_tpu as dl
        from dlimgedit_tpu.runtime.segmentation import _build_decode_fn

        env = dl.Environment(dl.Options(
            backend=dl.Backend.gpu, allow_random_weights=True,
            compute_dtype="bfloat16"))
        bundle = env.sam_model("mobile_sam")
        decode = _build_decode_fn(bundle, 1024, False, False)
        emb = (rng.standard_normal((1, 64, 64, 256)) * 0.1).astype(np.float32)
        pts = np.array([[[512.0, 512.0], [0.0, 0.0]]], np.float32)
        lbl = np.array([[1.0, -1.0]], np.float32)
        sizes = np.array([1024, 1024, 1024, 1024], np.int32)
        # Close over the params (weights are baked into the executable, the
        # deployment shape of a serving bundle).
        export("decode",
               lambda e, p, l, s: decode(bundle.params, e, p, l, s),
               [emb, pts, lbl, sizes])
    return 0


if __name__ == "__main__":
    sys.exit(main())
