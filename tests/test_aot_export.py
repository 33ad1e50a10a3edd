"""tools/aot_export.py produces a complete, well-formed export bundle.

Runs hermetically on CPU in a subprocess (the export serializes through
whatever PJRT backend is active; CPU executables serialize fine — only
the native PJRT replay, native/test/test_pjrt.cpp, needs the real plugin
and is exercised on hardware, BENCH_NOTES round 3)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_aot_export_serving_bundle_quantized(tmp_path):
    """--program serving exports a complete native-serving bundle on the
    hermetic CPU tier (tiny geometry), including the quantized modes: int8
    weight rows appear as `inw int8` spec lines the C loader understands
    (pjrt_backend.cpp |i1 -> PJRT_Buffer_Type_S8), packed-mask outputs obey
    the 1-D serving layout rule, and serving.txt records the quant mode."""
    # Build the native tree FIRST: the exporter records plugin_path.txt
    # only if libdlimg_pjrt_cpu.so already exists, so on a fresh build dir
    # the export-then-build order would bake an empty path into the bundle
    # (first-run-only failure; see tests/_native_build.prebuild_native).
    from tests._native_build import prebuild_native
    prebuild_native()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "aot_export.py"),
         "--out", str(tmp_path), "--program", "serving", "--backend", "cpu",
         "--variant", "mobile_sam", "--sam-image-size", "64",
         "--buckets", "128,256", "--batch-sizes", "4",
         "--quantize-activations"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    for name in ("serve_embed_mobile_sam_128", "serve_decode_mobile_sam_128",
                 "serve_decode3_mobile_sam_128",
                 "serve_decode_batch4_mobile_sam_128"):
        assert (tmp_path / f"{name}.pjrt").stat().st_size > 100
        assert (tmp_path / f"{name}.spec.txt").exists()

    embed_spec = (tmp_path / "serve_embed_mobile_sam_128.spec.txt").read_text()
    assert "inw int8" in embed_spec, embed_spec  # quantized projections
    dyn = [ln for ln in embed_spec.splitlines() if ln.startswith("ind ")]
    assert len(dyn) == 2  # canvas + sizes

    # Serving layout rule: every decode output the shim fetches raw is 1-D
    # (the packed mask) or scalar-ish (iou vector).
    dec_spec = (tmp_path / "serve_decode_mobile_sam_128.spec.txt").read_text()
    outs = [ln.split() for ln in dec_spec.splitlines()
            if ln.startswith("out ")]
    assert all(len(o[2].split(",")) == 1 for o in outs), outs

    serving = dict(ln.split("\t", 1) for ln in
                   (tmp_path / "serving.txt").read_text().splitlines())
    assert serving["variant"] == "mobile_sam"
    assert serving["buckets"] == "128,256"
    assert serving["quant"] == "w8,a8"
    # The capability probe (capi.cpp api_is_backend_supported) keys off this:
    # a CPU-exported bundle must never report dlimg_gpu support.
    assert serving["backend"] == "cpu"

    # The recorded expected outputs came from executing the REAL compiled
    # program — the packed mask must be a plausible bit-packed canvas.
    packed = np.load(tmp_path / "serve_decode_mobile_sam_128.out0.npy")
    assert packed.dtype == np.uint8 and packed.shape == (128 * 128 // 8,)
    # Batched multi-prompt decode (BASELINE config 3): 4 packed masks in
    # one flat 1-D output, plus a 4-vector of ious.
    bpacked = np.load(tmp_path / "serve_decode_batch4_mobile_sam_128.out0.npy")
    assert bpacked.dtype == np.uint8
    assert bpacked.shape == (4 * 128 * 128 // 8,)
    biou = np.load(tmp_path / "serve_decode_batch4_mobile_sam_128.out1.npy")
    assert biou.shape == (4,)

    # Cross-language contract: the C loader's own npy parser must read back
    # every spec row of this bundle (incl. the int8 weights) —
    # native/test/test_bundle_parse.cpp, no PJRT plugin required.
    from tests._native_build import BUILD_DIR, ensure_native_build

    binary = BUILD_DIR / "test_bundle_parse"
    ensure_native_build(binary)
    rc = subprocess.run([str(binary), str(tmp_path)], capture_output=True,
                        text=True)
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert "int8" in rc.stdout and "bundle parse OK" in rc.stdout

    # Byte-exact native execution, fully hermetic: every exported program
    # (embed + 1-mask + 3-mask decode, BOTH buckets, int8-quantized) runs
    # through the real C serving runner (pjrt_backend.cpp) against the
    # repo's own CPU PJRT plugin (pjrt_cpu_plugin.cc over
    # libtensorflow_cc's XLA:CPU) and must reproduce the jax-recorded
    # outputs bit-for-bit. This is the CI-resident regression guard for
    # argument interleaving, weight staging, dtype handling, and the 1-D
    # output-layout rule — previously only exercised in live chip sessions.
    plugin = BUILD_DIR / "libdlimg_pjrt_cpu.so"
    if not plugin.exists():
        import pytest
        pytest.skip("libdlimg_pjrt_cpu.so not built "
                    "(tensorflow C++ libraries unavailable)")
    assert (tmp_path / "plugin_path.txt").read_text().strip() == str(plugin)
    validator = BUILD_DIR / "test_serving_programs"
    programs = [f"serve_{kind}_mobile_sam_{b}"
                for b in (128, 256)
                for kind in ("embed", "decode", "decode3", "decode_batch4")]
    # --f32-ulp=16 covers only the f32 outputs (the plugin's own XLA
    # recompiles the program; measured <=9 ulp / <=8e-7 relative iou drift
    # on the a8 config from legal fma reordering).
    # Packed masks and every integer output remain byte-exact.
    rc = subprocess.run([str(validator), "--f32-ulp=16", str(tmp_path),
                         *programs],
                        capture_output=True, text=True, timeout=900, env=env)
    assert rc.returncode == 0, rc.stdout + rc.stderr[-2000:]
    assert rc.stdout.count(": PASS") == len(programs), rc.stdout
    # The embed program's f32 embedding must ALSO be exact-ish: assert the
    # report shows zero elements beyond tolerance everywhere.
    for ln in rc.stdout.splitlines():
        if "beyond" in ln or "bytes differ" in ln:
            assert ln.split(":")[1].strip().startswith("0/"), ln


def test_aot_export_smoke_bundle(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "aot_export.py"),
         "--out", str(tmp_path), "--program", "smoke"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]

    blob = (tmp_path / "smoke.pjrt").read_bytes()
    assert len(blob) > 100
    spec = json.loads((tmp_path / "smoke.spec.json").read_text())
    assert [i["dtype"] for i in spec["inputs"]] == ["float32", "float32"]
    assert spec["outputs"][0]["shape"] == [128, 128]

    # The expected output must equal the actual math of the program.
    a = np.load(tmp_path / "smoke.in0.npy")
    b = np.load(tmp_path / "smoke.in1.npy")
    want = np.load(tmp_path / "smoke.out0.npy")
    np.testing.assert_allclose(a @ b + 1.0, want, rtol=2e-5, atol=2e-5)

    # client_options.txt is the C-parsable mirror of client_options.json
    # (CPU backend registers no options; the FORMAT contract still holds).
    opts_json = json.loads((tmp_path / "client_options.json").read_text())
    lines = [ln for ln in (tmp_path / "client_options.txt")
             .read_text().splitlines() if ln]
    assert len(lines) == len(opts_json)
    for ln in lines:
        key, typ, _ = ln.split("\t", 2)
        assert typ in ("s", "i", "b")
        assert key in opts_json
