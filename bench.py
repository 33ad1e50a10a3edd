#!/usr/bin/env python
"""Benchmark harness: Segmentation::process and compute_mask latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...}

Baselines (BASELINE.md): reference GPU (RTX 4070) process ~50 ms,
compute_mask ~12 ms/mask; rebuild targets <50 ms process, <5 ms/mask on one
v5e chip. `vs_baseline` = 50 ms / value (>1 == faster than the reference GPU).

Metric definition. The reference's numbers are host-side latencies with a
LOCAL GPU. This harness's TPU is attached through a WAN relay with a
measured fixed ~28 ms round-trip per synchronisation (`tunnel_sync_floor_ms`
below, measured each run with a no-op executable) that no co-located
deployment pays. The headline `value` is therefore the co-located
end-to-end latency with every component individually measured ON THIS RUN:

    value = host pack (measured) + H2D transfer (measured)
          + true device execution (measured via chained execution, where
            each iteration feeds the next inside one program, so the WAN
            appears once for N iterations and divides out)

The raw through-the-tunnel latencies are reported alongside
(`tunnel_process_ms`, `tunnel_mask_ms`); they sit within noise of
device time + the measured sync floor, i.e. the WAN link is the only gap
between the two views.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import threading
import time

import numpy as np

# --- hang watchdog -----------------------------------------------------------
# The exception path below covers mid-run relay FAILURES; a mid-run relay
# DEATH instead makes the next jax call block forever (CLAUDE.md: every call
# through the dead relay hangs), and a hung bench leaves the round with no
# artifact at all — strictly worse than a CPU record. Measurement loops and
# phase boundaries call _beat(); if no beat lands for DLIMG_BENCH_HANG_S
# (default 20 min — longer than the worst healthy-tunnel compile of the
# fori-wrapped chained programs), the watchdog re-execs the bench on CPU.
_last_beat = time.monotonic()


def _beat():
    global _last_beat
    _last_beat = time.monotonic()


def _hang_fallback():  # separated so tests can stub it
    print("bench made no progress past the hang budget — relay presumed "
          "dead mid-run; re-running on CPU", file=sys.stderr)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["DLIMG_BENCH_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _start_watchdog():
    """Returns a stop Event (tests MUST set it before teardown — a live
    watchdog whose fallback fires later would execve the host process),
    or None when already on the CPU fallback."""
    if os.environ.get("DLIMG_BENCH_REEXEC") == "1":
        return None  # already on CPU: nothing left to hang on
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return None  # hangs are a relay-transport failure mode only
    budget = float(os.environ.get("DLIMG_BENCH_HANG_S", "1200"))
    poll = min(30.0, budget / 4)
    stop = threading.Event()

    def watch():
        while not stop.wait(poll):
            if time.monotonic() - _last_beat > budget:
                _hang_fallback()
                return

    threading.Thread(target=watch, daemon=True,
                     name="bench-hang-watchdog").start()
    return stop


def _probe_with_timeout():
    """The remote-TPU relay can die (see CLAUDE.md); a dead relay makes
    every jax call hang forever, so probe device init in a subprocess
    (the shared probe lives in __graft_entry__, next to the compile gate's
    identical degrade path)."""
    from __graft_entry__ import relay_probe_ok

    return relay_probe_ok() or None


def _maybe_fallback_to_cpu():
    if os.environ.get("DLIMG_BENCH_REEXEC") == "1":
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    if _probe_with_timeout():
        return
    # Bounded recovery loop: this JSON line is the round's official perf
    # artifact, and a TRANSIENT relay outage at the moment the driver runs
    # must not demote it to a CPU record (that is exactly how BENCH_r03
    # became a CPU capture). Keep probing on a budget before giving up —
    # costs nothing when the relay is healthy (first probe succeeds above).
    budget_s = float(os.environ.get("DLIMG_BENCH_RELAY_WAIT_S", "900"))
    deadline = time.monotonic() + budget_s
    while time.monotonic() < deadline:
        wait = min(60.0, max(0.0, deadline - time.monotonic()))
        print(f"relay down; retrying probe in {wait:.0f}s "
              f"({deadline - time.monotonic():.0f}s of budget left)",
              file=sys.stderr)
        time.sleep(wait)
        if _probe_with_timeout():
            print("relay recovered; proceeding on accelerator",
                  file=sys.stderr)
            return
    print("accelerator relay unreachable; re-running bench on CPU",
          file=sys.stderr)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["DLIMG_BENCH_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def median_ms(fn, iters):
    ts = []
    for _ in range(iters):
        _beat()
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def min_ms(fn, iters):
    """Steady-state cost of one component: the min over iters. Used for the
    per-component decomposition, where relay-side hiccups (allocation, GC,
    queue collisions — tens of ms, visible as outliers) would otherwise be
    double-counted against components that are micro- to milliseconds."""
    ts = []
    for _ in range(iters):
        _beat()
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def main():
    _maybe_fallback_to_cpu()
    _start_watchdog()
    try:
        _run()
    except Exception as e:  # noqa: BLE001 — record SOMETHING, always
        # Mid-run relay failures (HTTP 500 from the remote compile helper,
        # FailedPrecondition device errors) happen; the recorded artifact
        # must still be a valid JSON line. Retry in a FRESH process — an
        # in-process retry would re-measure transfers after the first D2H
        # fetch has already degraded the relay connection (see the
        # measured-before-any-fetch invariant below) — then fall back to
        # the CPU path if the retry also fails.
        print(f"bench attempt failed ({type(e).__name__}: {str(e)[:200]})",
              file=sys.stderr)
        env = dict(os.environ)
        if env.get("DLIMG_BENCH_RETRIED") != "1":
            print("retrying once in a fresh process", file=sys.stderr)
            env["DLIMG_BENCH_RETRIED"] = "1"
        elif env.get("DLIMG_BENCH_REEXEC") != "1":
            print("retry failed; re-running on CPU", file=sys.stderr)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["DLIMG_BENCH_REEXEC"] = "1"
        else:
            raise
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _run():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="mobile_sam")
    ap.add_argument("--size", type=int, default=1024, help="input image size")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--compute-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    import dlimgedit_tpu as dl
    from dlimgedit_tpu.runtime.segmentation import _build_embed_fn
    from dlimgedit_tpu.ops.preprocess import (
        pack_rgb_canvas, pick_bucket, staging_canvas)

    accel = dl.is_supported(dl.Backend.gpu)
    # Persist compiled executables across bench runs (first compile of the
    # fori-loop-wrapped models through the remote TPU takes minutes).
    cache_dir = os.environ.get(
        "DLIMG_COMPILATION_CACHE",
        os.path.expanduser("~/.cache/dlimgedit_tpu/xla"))
    if not accel:
        # XLA:CPU AOT cache entries are host-feature specific; reloading
        # entries compiled on a different machine works but floods stderr
        # with "could lead to SIGILL" warnings. Scope the CPU cache per
        # host fingerprint (TPU executables are host-independent).
        from __graft_entry__ import _machine_fingerprint
        cache_dir = os.path.join(cache_dir, "cpu-" + _machine_fingerprint())
    env = dl.Environment(dl.Options(
        backend=dl.Backend.gpu if accel else dl.Backend.cpu,
        allow_random_weights=True,
        compute_dtype=args.compute_dtype if accel else "float32",
        compilation_cache_dir=cache_dir,
    ))

    if not accel:
        # CPU fallback (dead relay): keep the run short — slope chains and
        # medians shrink; the methodology stays identical.
        args.iters = min(args.iters, 3)
    rng = np.random.default_rng(0)
    img = dl.Image(dl.Extent(args.size, args.size), dl.Channels.rgba,
                   rng.integers(0, 256, (args.size, args.size, 4),
                                dtype=np.uint8))

    # --- transfer components FIRST, on a clean channel -----------------------
    # Measured fact about this relay (see CLAUDE.md): the FIRST host fetch
    # (device_get) permanently switches the connection into a ~40 ms/op
    # mode. Transfers must therefore be measured before any fetch happens in
    # this process — which is also exactly the co-located semantics the
    # headline decomposition wants (a local host never sees that mode).
    import jax.numpy as jnp

    bucket = pick_bucket(dl.Extent(args.size, args.size))
    # Measure the pack as process() performs it off-CPU: native channel-map
    # loop into a pooled staging canvas (no zeroing; see
    # ops/preprocess.staging_canvas). On the CPU fallback the pool is
    # bypassed, matching process()'s own platform gate.
    if accel:
        pack_ms = min_ms(
            lambda: pack_rgb_canvas(img.view(), bucket,
                                    out=staging_canvas(bucket)),
            args.iters)
    else:
        pack_ms = min_ms(lambda: pack_rgb_canvas(img.view(), bucket),
                         args.iters)
    canvas_np = pack_rgb_canvas(img.view(), bucket)
    tiny_np = np.zeros((2, 2), np.float32)
    jax.device_put(tiny_np, env.device).block_until_ready()  # channel warm
    h2d_ms = min_ms(
        lambda: jax.device_put(canvas_np, env.device).block_until_ready(),
        args.iters)
    put_tiny_ms = min_ms(
        lambda: jax.device_put(tiny_np, env.device).block_until_ready(),
        args.iters)
    # Pipelined pack+H2D A/B (VERDICT r3 #6): with n chunks the host pack
    # of row block i+1 overlaps block i's in-flight async put. process()
    # picks the chunk count via resolve_h2d_chunks (4 co-located, 1 on the
    # relay/CPU); both combined costs are recorded so each transport's
    # winner is visible in the artifact.
    from dlimgedit_tpu.ops.preprocess import pack_and_put_canvas

    def _pipe(n):
        parts, _ = pack_and_put_canvas(img.view(), bucket, env.device,
                                       pooled=accel, n_chunks=n)
        for p in parts:
            p.block_until_ready()

    pack_h2d_seq_ms = min_ms(lambda: _pipe(1), args.iters)
    pack_h2d_pipe_ms = min_ms(lambda: _pipe(4), args.iters)

    # Warmup every executable AND every fetch path (first D2H per program can
    # stall on remote-attached TPUs).
    for _ in range(2):
        _beat()  # each warmup step may compile for minutes; reset the hang timer
        seg = dl.Segmentation.process(img, env, variant=args.variant)
        seg.compute_mask(dl.Point(args.size // 2, args.size // 2))
        seg.compute_masks(dl.Point(args.size // 2, args.size // 2))

    # --- raw through-the-tunnel latencies (include the WAN sync floor) ------
    def do_process():
        s = dl.Segmentation.process(img, env, variant=args.variant)
        s.embedding.block_until_ready()
        return s

    tunnel_process_ms = median_ms(do_process, args.iters)

    seg = dl.Segmentation.process(img, env, variant=args.variant)
    pts = [dl.Point(int(x), int(y))
           for x, y in rng.integers(8, args.size - 8, (args.iters, 2))]
    it = iter(pts * 2)
    tunnel_mask_ms = median_ms(lambda: seg.compute_mask(next(it)), args.iters)

    # --- the tunnel's fixed sync round-trip ----------------------------------
    f_sync = jax.jit(lambda x: x + 1.0)
    x_sync = jax.device_put(jnp.zeros((8, 128), jnp.float32), env.device)
    jax.device_get(f_sync(x_sync))
    sync_floor_ms = min_ms(lambda: jax.device_get(f_sync(x_sync)),
                           args.iters)
    # Host-side unpack of the bit-packed mask payload (postprocess.py).
    packed = np.frombuffer(
        rng.integers(0, 256, bucket * bucket // 8, dtype=np.uint8)
        .tobytes(), dtype=np.uint8)
    unpack_ms = min_ms(
        lambda: np.unpackbits(packed)[: args.size * args.size], args.iters)
    # Co-located D2H of the packed payload, estimated at the measured
    # H2D bandwidth of this run (payload is 8x bit-packed on device).
    h2d_bw = canvas_np.nbytes / max(h2d_ms, 1e-6)        # bytes/ms
    d2h_mask_ms = packed.nbytes / h2d_bw

    # --- true device-execution latencies (chained: on remote-attached TPUs
    # block_until_ready acknowledges dispatch, so each iteration's output
    # feeds the next inside one program and we fetch once at the end) -------
    from jax import lax

    from dlimgedit_tpu.models import sam as sam_lib
    from dlimgedit_tpu.ops.preprocess import sam_preprocess

    bundle = env.sam_model(args.variant)
    cfg = bundle.cfg
    canvas = jax.device_put(pack_rgb_canvas(img.view(), bucket), env.device)
    sizes = jax.device_put(np.array([args.size] * 4, np.int32), env.device)
    NCH = 10 if accel else 2

    def slope_ms(make_fn, fn_args, reps=4):
        """True per-iteration device time via a two-point slope:
        (T(2N) - T(N)) / N. Cancels EVERY fixed cost — dispatch, the
        tunnel's ~28 ms sync round-trip, fetch — which at N=10 would
        otherwise inflate each iteration by ~3 ms."""
        f1 = jax.jit(make_fn(NCH))
        f2 = jax.jit(make_fn(2 * NCH))
        _beat()  # chained-program compiles are the longest healthy gaps
        jax.device_get(f1(*fn_args))
        _beat()
        jax.device_get(f2(*fn_args))

        def best(f):
            ts = []
            for _ in range(reps):
                _beat()
                t0 = time.perf_counter()
                jax.device_get(f(*fn_args))
                ts.append((time.perf_counter() - t0) * 1e3)
            return min(ts)

        return max(best(f2) - best(f1), 0.0) / NCH

    def make_chained_process(nch):
        def chained_process(params, canvas, sizes):
            def body(i, acc):
                x = sam_preprocess(
                    canvas, sizes[0] + (acc * 1e-20).astype(jnp.int32),
                    sizes[1], sizes[2], sizes[3],
                    image_size=cfg.image_size,
                    compute_dtype=bundle.compute_dtype)
                e = sam_lib.encode_image(params, cfg, x)
                return jnp.sum(e.astype(jnp.float32))
            return lax.fori_loop(0, nch, body, jnp.float32(0))
        return chained_process

    dev_process_ms = slope_ms(make_chained_process,
                              (bundle.params, canvas, sizes))

    embed = _build_embed_fn(bundle)
    emb = embed(bundle.params, (canvas,), sizes)
    points = jax.device_put(np.array([[[512.0, 512.0], [0.0, 0.0]]],
                                     np.float32), env.device)
    labels = jax.device_put(np.array([[1.0, -1.0]], np.float32), env.device)

    def make_chained_decode(nch):
        def chained_decode(params, emb, points, labels, sizes):
            from dlimgedit_tpu.ops.postprocess import (
                threshold_mask, upsample_mask_logits)

            def body(i, acc):
                m, iou = sam_lib.decode_masks(
                    params, cfg, emb + acc * 1e-20, points, labels,
                    multimask=False)
                logits = upsample_mask_logits(m, bucket, cfg.image_size,
                                              sizes[0], sizes[1], sizes[2],
                                              sizes[3])
                u8 = threshold_mask(logits)
                return jnp.sum(u8.astype(jnp.float32)) * 1e-9 + jnp.sum(iou)
            return lax.fori_loop(0, nch, body, jnp.float32(0))
        return chained_decode

    dev_mask_ms = slope_ms(make_chained_decode,
                           (bundle.params, emb, points, labels, sizes))

    platform = jax.devices()[0].platform
    baseline_process_ms = 50.0  # reference GPU (README.md:35)
    # Headline: co-located e2e = measured host pack + measured H2D +
    # measured true device execution (see module docstring).
    total_process = pack_ms + h2d_ms + dev_process_ms
    # Mask query, co-located: point H2D + device decode + bit-packed D2H
    # (at measured link bandwidth) + host unpack.
    total_mask = put_tiny_ms + dev_mask_ms + d2h_mask_ms + unpack_ms
    print(json.dumps({
        "metric": f"SAM {args.variant} Segmentation::process ms/image "
                  f"@{args.size}px ({platform}, est. co-located e2e)",
        "value": round(total_process, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_process_ms / total_process, 3),
        # The headline is a SYNTHESIZED co-located estimate (measured host
        # pack + measured H2D + slope-measured device time; the mask adds an
        # estimated D2H priced at measured H2D bandwidth), compared against
        # the reference's measured 50 ms local-GPU e2e. The raw measured
        # through-the-WAN-tunnel latencies are emitted alongside with equal
        # prominence under tunnel_* keys.
        "value_kind": "estimated_colocated_e2e_ms",
        "compute_mask_ms": round(total_mask, 3),
        "compute_mask_vs_baseline": round(12.0 / total_mask, 3),
        "device_process_ms": round(dev_process_ms, 3),
        "device_compute_mask_ms": round(dev_mask_ms, 3),
        "host_pack_ms": round(pack_ms, 3),
        "h2d_canvas_ms": round(h2d_ms, 3),
        "pack_h2d_seq_ms": round(pack_h2d_seq_ms, 3),
        "pack_h2d_pipelined_ms": round(pack_h2d_pipe_ms, 3),
        "mask_d2h_est_ms": round(d2h_mask_ms, 3),
        "mask_unpack_ms": round(unpack_ms, 3),
        # Raw measured dispatch latency of process through the tunnel
        # (block_until_ready acks early for small programs, so this misses
        # device time) and the device-time-adjusted composite, separately:
        "tunnel_process_dispatch_ms": round(tunnel_process_ms, 3),
        "tunnel_process_est_ms": round(tunnel_process_ms + dev_process_ms, 3),
        "tunnel_mask_ms": round(tunnel_mask_ms, 3),
        "tunnel_sync_floor_ms": round(sync_floor_ms, 3),
        "platform": platform,
        # On the CPU-fallback path (dead TPU relay — this line is then a
        # CPU measurement, NOT the chip's), point the reader at the last
        # real-chip record instead of letting the number stand alone.
        **({} if platform != "cpu" else {
            "note": "TPU relay unreachable; CPU fallback. Last real v5e "
                    "record: process 8.56 ms (5.8x), compute_mask 0.89 ms "
                    "(13.5x) — BENCH_NOTES.md round 3.",
        }),
    }))


if __name__ == "__main__":
    main()
