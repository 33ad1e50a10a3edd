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


def _plugin_so(backend: str = "gpu") -> str:
    if backend == "cpu":
        # CPU test-tier bundles run through the repo's own CPU PJRT plugin
        # (native/src/pjrt_cpu_plugin.cc, built over libtensorflow_cc).
        cand = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "native", "build",
            "libdlimg_pjrt_cpu.so")
        return cand if os.path.exists(cand) else ""
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
    ap.add_argument("--program", default="smoke",
                    choices=["smoke", "decode", "serving"])
    ap.add_argument("--variant", default="mobile_sam",
                    help="serving: SAM encoder variant")
    ap.add_argument("--buckets", default="1024",
                    help="serving: comma list of canvas buckets to export")
    ap.add_argument("--birefnet", default="",
                    help="serving: comma list of kind:bucket BiRefNet "
                         "programs to also export (e.g. general:1024); "
                         "enables segment_objects in the native shim")
    ap.add_argument("--backend", default="gpu", choices=["gpu", "cpu"],
                    help="serving: device the programs compile for (cpu = "
                         "hermetic test tier; executables serialize through "
                         "whatever PJRT backend is active)")
    ap.add_argument("--sam-image-size", type=int, default=0,
                    help="serving: override SAM model resolution (tests "
                         "export tiny geometries)")
    ap.add_argument("--amg", default="",
                    help="serving: also export the automatic-mask-"
                         "generation program as grid:max_masks (e.g. "
                         "'32:64'); enables generate_masks in the native "
                         "shim (one program per bucket)")
    ap.add_argument("--batch-sizes", default="",
                    help="serving: also export batched multi-prompt decode "
                         "programs at these prompt counts (comma list, e.g. "
                         "'4,8'; BASELINE config 3)")
    ap.add_argument("--quantize", action="store_true",
                    help="serving: int8 encoder projection weights "
                         "(Options.quantize_encoder — halves encoder HBM)")
    ap.add_argument("--quantize-activations", action="store_true",
                    help="serving: s8 x s8 MXU projections "
                         "(Options.quantize_activations; implies --quantize)")
    ap.add_argument("--int8-deform", action="store_true",
                    help="serving: int8 BiRefNet deformable-sampling "
                         "gathers (Options.birefnet_int8_deform, <2% "
                         "bounded mask deviation)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    _capture_client_options()
    import jax
    import jax.numpy as jnp
    import numpy as np

    # --backend cpu must also pick the CPU DEVICE: the axon plugin ignores
    # JAX_PLATFORMS (CLAUDE.md), so on a TPU-attached host jax.devices()[0]
    # is the tunneled TPU and every device_put/lower below would compile
    # for it regardless of the Environment's backend choice.
    dev = (jax.devices("cpu")[0] if getattr(args, "backend", "gpu") == "cpu"
           else jax.devices()[0])
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
        f.write(_plugin_so(getattr(args, "backend", "gpu")))

    rng = np.random.default_rng(0)

    cpu_tier = getattr(args, "backend", "gpu") == "cpu"

    def _program_blob(comp, lowered):
        """Program bytes for <name>.pjrt.

        Accelerator bundles ship the serialized compiled executable (the
        plugin that loads them is the same build that would compile). CPU
        test-tier bundles ship "DLIMGHLO1" + the PRE-optimization
        HloModuleProto instead, compiled by libdlimg_pjrt_cpu.so's own
        XLA. Measured with the tensorflow-wheel XLA (~6 months older than
        jaxlib's):
          * serialized executables deserialize but MISREAD the buffer
            assignment (garbage outputs on every non-trivial program);
          * post-optimization HLO (scheduled, fused) fails its
            AlgebraicSimplifier re-run with an invalid-layout error;
          * pre-optimization HLO compiles and matches byte-exactly.
        XLA:CPU prunes unused entry parameters from pre-opt HLO exactly
        like jax's compile does (_kept_var_idx), so the spec's kept-args
        contract holds unchanged on both tiers.
        """
        if cpu_tier:
            ir = lowered.compiler_ir("hlo")
            return b"DLIMGHLO1" + ir.as_serialized_hlo_module_proto()
        return comp._executable.xla_executable.serialize()

    def export(name, fn, example_inputs):
        placed = [jax.device_put(x, dev) for x in example_inputs]
        lowered = jax.jit(fn).lower(*placed)
        comp = lowered.compile()
        blob = _program_blob(comp, lowered)
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
        # C-parsable spec: "<in|out> <dtype> <d0,d1,...>" per line.
        with open(os.path.join(args.out, f"{name}.spec.txt"), "w") as f:
            for x in example_inputs:
                a = np.asarray(x)
                f.write(f"in {a.dtype} {','.join(map(str, a.shape))}\n")
            for o in outs:
                f.write(f"out {o.dtype} {','.join(map(str, o.shape))}\n")
        for i, x in enumerate(example_inputs):
            np.save(os.path.join(args.out, f"{name}.in{i}.npy"),
                    np.ascontiguousarray(np.asarray(x)))
        for i, o in enumerate(outs):
            np.save(os.path.join(args.out, f"{name}.out{i}.npy"), o)
        print(f"exported {name}: {len(blob)} bytes, "
              f"{len(example_inputs)} in / {len(outs)} out", flush=True)
        return outs

    if args.program == "smoke":
        export("smoke",
               lambda a, b: (jnp.dot(a, b) + 1.0).astype(jnp.float32),
               [rng.standard_normal((128, 128)).astype(np.float32),
                rng.standard_normal((128, 128)).astype(np.float32)])
    elif args.program == "serving":
        # The full native-serving bundle (SURVEY §7.5): per canvas bucket,
        # the embed program + single-mask and 3-mask decode programs.
        # CRITICAL for parity: lower the SAME jitted callables the Python
        # runtime executes, with the params pytree as ARGUMENTS — a
        # weights-baked-as-constants re-trace compiles to a different
        # binary whose bf16 boundary pixels flip vs the Python pipeline
        # (measured 0.6% of mask pixels). Weight leaves are written as
        # .npy files the C backend uploads once at startup
        # (native/src/pjrt_backend.cpp); only the trailing dynamic args
        # (canvas/emb/points/labels/sizes) are fed per call.
        import dlimgedit_tpu as dl
        from dlimgedit_tpu.runtime.segmentation import (_build_decode_fn,
                                                        _build_embed_fn)

        extra = {}
        if args.sam_image_size:
            extra["sam_image_size"] = args.sam_image_size
        env = dl.Environment(dl.Options(
            backend=(dl.Backend.cpu if args.backend == "cpu"
                     else dl.Backend.gpu),
            allow_random_weights=True,
            compute_dtype="bfloat16",
            quantize_encoder=args.quantize,
            quantize_activations=args.quantize_activations,
            birefnet_int8_deform=args.int8_deform,
            # Persist across runs: first 1024-bucket compiles through the
            # tunnel take minutes; re-exports then hit the cache.
            compilation_cache_dir=os.environ.get(
                "DLIMG_COMPILATION_CACHE",
                os.path.expanduser("~/.cache/dlimgedit_tpu/xla")),
            **extra))
        bundle = env.sam_model(args.variant)
        buckets = [int(b) for b in args.buckets.split(",")]

        def export_served(name, jitted, tree_args, n_dynamic):
            placed = jax.device_put(tree_args, dev)
            lowered = jitted.lower(*placed)
            comp = lowered.compile()
            blob = _program_blob(comp, lowered)
            with open(os.path.join(args.out, f"{name}.pjrt"), "wb") as f:
                f.write(blob)
            flat = jax.tree_util.tree_leaves(placed)
            # Both tiers keep exactly _kept_var_idx: the accelerator
            # executable by construction, and the CPU tier because XLA:CPU
            # prunes unused entry params from pre-opt HLO identically
            # (measured: 219/138 kept on both sides for these programs).
            kept = sorted(getattr(comp._executable, "_kept_var_idx",
                                  range(len(flat))))
            n_weights = len(flat) - n_dynamic
            outs = comp(*placed)
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            outs = [np.asarray(o) for o in outs]
            with open(os.path.join(args.out, f"{name}.spec.txt"), "w") as f:
                for j, i in enumerate(kept):
                    # ascontiguousarray is LOAD-BEARING: np.asarray of a
                    # device array can come back Fortran-ordered (the host
                    # copy mirrors the device layout for some matrix
                    # shapes), np.save preserves that, and the C loader
                    # (pjrt_backend.cpp) streams raw bytes as C-order —
                    # transposed weights, garbage masks (found the hard
                    # way: 60% of mask pixels off).
                    a = np.ascontiguousarray(np.asarray(flat[i]))
                    kind = "w" if i < n_weights else "d"
                    f.write(f"in{kind} {a.dtype} "
                            f"{','.join(map(str, a.shape))}\n")
                    # Weights: uploaded once by the C backend at startup.
                    # Dynamic: example values for the per-program bit-exact
                    # validator (test_serving_programs).
                    np.save(os.path.join(args.out, f"{name}.in{j}.npy"), a)
                for i, o in enumerate(outs):
                    o = np.ascontiguousarray(o)
                    f.write(f"out {o.dtype} "
                            f"{','.join(map(str, o.shape))}\n")
                    np.save(os.path.join(args.out, f"{name}.out{i}.npy"), o)
            # Outputs the C shim fetches raw must linearize in C order:
            # old PJRT plugins' ToHostBuffer copies device order without
            # de-permuting minor-to-major, and XLA assigns outputs whose
            # minor dim is under the 128-byte lane tile a TRANSPOSED
            # layout (found the hard way: every 512-bucket packed mask
            # came back byte-transposed). 1-D outputs are immune — the
            # program builders flatten (runtime/segmentation.py
            # _build_decode_fn); for anything multi-dim, require the
            # default minor-to-major here. A tiling suffix (":T(...)") is
            # fine — untiling is handled by the plugin (1024 programs are
            # byte-exact).
            try:
                layouts = comp._executable.xla_executable.get_output_layouts()
            except Exception as e:  # older plugins may lack the query
                print(f"  (no output-layout query: {e})", flush=True)
                layouts = []
            for i, (o, lay) in enumerate(zip(outs, layouts)):
                if o.ndim <= 1:
                    continue
                default = "{" + ",".join(map(str, reversed(range(o.ndim))))
                s = str(lay)
                if not (s.startswith(default + "}")
                        or s.startswith(default + ":")):
                    raise RuntimeError(
                        f"{name} out{i} shape {o.shape} has non-default "
                        f"layout {s}; the native shim's raw ToHostBuffer "
                        f"would permute it — flatten this output to 1-D "
                        f"in the program and reshape on the host")
            print(f"exported {name}: {len(blob)} bytes, "
                  f"{len(kept)} kept args ({n_dynamic} dynamic), "
                  f"{len(outs)} out", flush=True)
            return outs

        for bucket in buckets:
            embed = _build_embed_fn(bundle)
            canvas = rng.integers(0, 256, (bucket, bucket, 3),
                                  dtype=np.uint8)
            side = min(bucket, bundle.cfg.image_size)
            sizes = np.array([bucket, bucket, side, side], np.int32)
            # The canvas rides as a 1-tuple (single-put serving layout);
            # pytree flattening keeps the exported arg list identical.
            emb, = export_served(f"serve_embed_{args.variant}_{bucket}",
                                 embed, (bundle.params, (canvas,), sizes), 2)
            pts = np.array([[[bucket / 2, bucket / 2], [0.0, 0.0]]],
                           np.float32)
            lbl = np.array([[1.0, -1.0]], np.float32)
            dsizes = np.array([bucket, bucket, side, side], np.int32)
            dec = _build_decode_fn(bundle, bucket, False, False)
            export_served(f"serve_decode_{args.variant}_{bucket}", dec,
                          (bundle.params, emb, pts, lbl, dsizes), 4)
            dec3 = _build_decode_fn(bundle, bucket, True, False)
            export_served(f"serve_decode3_{args.variant}_{bucket}", dec3,
                          (bundle.params, emb, pts, lbl, dsizes), 4)
            # Batched multi-prompt decode (BASELINE config 3): N prompts
            # against ONE cached embedding in a single program, 1-D packed
            # masks per prompt. Exercise a point/region mix so the example
            # inputs cover both prompt protocols.
            for nb in [int(n) for n in filter(None,
                                              args.batch_sizes.split(","))]:
                from dlimgedit_tpu.runtime.segmentation import (
                    _build_batch_decode_fn)

                bpts = np.zeros((nb, 2, 2), np.float32)
                blbl = np.full((nb, 2), -1.0, np.float32)
                for i in range(nb):
                    if i % 2 == 0:  # point prompt
                        bpts[i, 0] = (bucket / 2 + i, bucket / 2)
                        blbl[i] = (1.0, -1.0)
                    else:           # region prompt (labels 2/3)
                        bpts[i] = ((bucket / 4, bucket / 4),
                                   (3 * bucket / 4, 3 * bucket / 4))
                        blbl[i] = (2.0, 3.0)
                bdec = _build_batch_decode_fn(bundle, bucket)
                export_served(
                    f"serve_decode_batch{nb}_{args.variant}_{bucket}",
                    bdec, (bundle.params, emb, bpts, blbl, dsizes), 4)
            if args.amg:
                # Automatic mask generation: the SAME builder the Python
                # runtime jits (runtime/amg.py) with identical static
                # grid/K/prenms/chunk — native generate_masks is then
                # bit-identical to Segmentation.generate_masks. Dynamic
                # args: embedding, sizes, 5-float threshold vector.
                from dlimgedit_tpu.runtime.amg import (_build_amg_fn,
                                                       _chunk_size)

                g, k = (int(v) for v in args.amg.split(":"))
                G = g * g
                k = min(k, 3 * G)  # same clamp as runtime generate_masks
                args.amg = f"{g}:{k}"
                prenms = min(3 * G, max(256, 4 * k))
                amg = _build_amg_fn(bundle, bucket, g, k, prenms,
                                    _chunk_size(G))
                thr = np.array([0.5, 0.5, 0.7, 0.0, 1.0], np.float32)
                export_served(f"serve_amg_{args.variant}_{bucket}", amg,
                              (bundle.params, emb, dsizes, thr), 3)
        # Optional BiRefNet programs -> native segment_objects
        # (runtime/birefnet.py birefnet_segment without the Python host).
        biref_specs = []
        for spec_str in filter(None, args.birefnet.split(",")):
            kind, bucket_s = spec_str.split(":")
            bucket = int(bucket_s)
            from dlimgedit_tpu.runtime.birefnet import _build_birefnet_fn

            bbundle = env.birefnet_model(kind)
            run = _build_birefnet_fn(bbundle, bucket)
            canvas = rng.integers(0, 256, (bucket, bucket, 3),
                                  dtype=np.uint8)
            bsizes = np.array([bucket, bucket], np.int32)
            export_served(f"serve_birefnet_{kind}_{bucket}", run,
                          (bbundle.params, (canvas,), bsizes), 2)
            biref_specs.append(f"{kind}:{bucket}:{bbundle.resolution}")
        with open(os.path.join(args.out, "serving.txt"), "w") as f:
            f.write(f"variant\t{args.variant}\n")
            # Which backend the programs were lowered for — the C shim's
            # capability probe reports support consistent with this (a
            # CPU-exported bundle must not claim dlimg_gpu support).
            f.write(f"backend\t{args.backend}\n")
            f.write(f"image_size\t{bundle.cfg.image_size}\n")
            f.write(f"buckets\t{','.join(map(str, buckets))}\n")
            if args.batch_sizes:
                f.write(f"batch\t{args.batch_sizes}\n")
            if args.amg:
                f.write(f"amg\t{args.amg}\n")
            if biref_specs:
                f.write(f"birefnet\t{','.join(biref_specs)}\n")
            quant = [m for m, on in (
                ("w8", args.quantize or args.quantize_activations),
                ("a8", args.quantize_activations),
                ("deform8", args.int8_deform)) if on]
            if quant:
                f.write(f"quant\t{','.join(quant)}\n")
    else:
        import dlimgedit_tpu as dl
        from dlimgedit_tpu.runtime.segmentation import _build_decode_fn

        env = dl.Environment(dl.Options(
            backend=dl.Backend.gpu, allow_random_weights=True,
            compute_dtype="bfloat16",
            # Persist across runs: first 1024-bucket compiles through the
            # tunnel take minutes; re-exports then hit the cache.
            compilation_cache_dir=os.environ.get(
                "DLIMG_COMPILATION_CACHE",
                os.path.expanduser("~/.cache/dlimgedit_tpu/xla"))))
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
