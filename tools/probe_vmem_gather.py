#!/usr/bin/env python
"""Probe: throughput of tpu.dynamic_gather (sublane gather) from a
VMEM-resident table inside a Pallas kernel, vs the XLA HBM gather engine.

Motivation (BENCH_NOTES round 4): BiRefNet's deformable-conv gathers are
fetch-LATENCY-bound on the XLA gather engine (~10 ns/row regardless of row
width: int8 rows halved bytes and saved ~nothing; 512-B rows cost the same
per row as 128-B rows).  deform k7 @1024 = 33.5 ms for 3.2M (pixel, tap)
row fetches.  If a VMEM-resident sublane gather sustains >= 1 value/lane/
cycle-ish rates, a Pallas deform-sampling kernel is a ~10-30x lever; if
Mosaic's lowering is O(table_rows) per output vreg, it is useless.  This
probe measures exactly that rate with the deform geometry's numbers.

Run (repo root, live relay, nothing else on the chip):
    python tools/probe_vmem_gather.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gather_kernel(table_ref, idx_ref, out_ref, *, reps: int):
    """out = take_along_axis(table, idx, axis=0), re-gathered `reps` times
    with a varying index so the compiler cannot hoist the loop body."""
    table = table_ref[:]
    idx = idx_ref[:]
    n = table.shape[0]

    def body(i, acc):
        shifted = jax.lax.rem(idx + i, n)
        g = jnp.take_along_axis(table, shifted, axis=0,
                                mode="promise_in_bounds")
        return acc + g.astype(jnp.float32)

    out_ref[:] = lax.fori_loop(0, reps, body,
                               jnp.zeros(table.shape, jnp.float32))


@functools.partial(jax.jit, static_argnames=("reps",))
def run_gather(table, idx, reps):
    return pl.pallas_call(
        functools.partial(gather_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(table.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table, idx)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})", flush=True)
    rows, lanes = 4096, 128          # table 1 MB bf16, idx 2 MB i32
    key = jax.random.PRNGKey(0)
    table = (jax.random.normal(key, (rows, lanes)) * 0.5).astype(jnp.bfloat16)
    # Random full-range rows, replicated across lanes (the deform pattern:
    # one row index per (pixel, tap), all channels move together).
    ridx = jax.random.randint(jax.random.PRNGKey(1), (rows, 1), 0, rows,
                              dtype=jnp.int32)
    idx_rep = jnp.broadcast_to(ridx, (rows, lanes)).astype(jnp.int32)
    # Fully independent per-lane indices (harder case).
    idx_free = jax.random.randint(jax.random.PRNGKey(2), (rows, lanes), 0,
                                  rows, dtype=jnp.int32)

    for name, idx in (("row-replicated", idx_rep), ("per-lane", idx_free)):
        for reps in (8, 16):
            try:
                out = run_gather(table, idx, reps)
                out.block_until_ready()
                t0 = time.perf_counter()
                n_timed = 8
                for _ in range(n_timed):
                    out = run_gather(table, idx, reps)
                jax.device_get(jnp.sum(out))
                dt = (time.perf_counter() - t0) / n_timed
                vals = rows * lanes * reps
                print(f"{name:15s} reps={reps:3d}: {dt*1e3:8.3f} ms/call "
                      f"-> {vals/dt/1e9:8.2f} Gvalues/s "
                      f"({vals*2/dt/1e9:7.1f} GB/s bf16-equiv)", flush=True)
            except Exception as e:  # lowering may refuse a case — report it
                print(f"{name:15s} reps={reps:3d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                break

    # XLA HBM gather engine: per-fetch cost vs TABLE ROW LAYOUT.  Theory
    # under test: the engine fetches whole (sublane, 128-lane) tiles, so a
    # (N, 256) bf16 row (2 lane-tiles x 1 sublane) costs TWO 4-KB tile
    # fetches for 512 useful bytes (measured ~10 ns/row at every dtype),
    # while packing the same 512 B as (N, 2, 128) (2 sublanes x 1 lane-
    # tile) costs ONE -> ~2x.  Each case fetches the same 65536 logical
    # positions x 8 iterations.
    big_rows = 65536
    base = (jax.random.normal(key, (big_rows, 256)) * 0.5
            ).astype(jnp.bfloat16)
    gidx0 = jax.random.randint(jax.random.PRNGKey(3), (big_rows,), 0,
                               big_rows, dtype=jnp.int32)

    def time_case(name, tbl, gather_fn, useful_bytes):
        @jax.jit
        def run(t, i):
            def body(k, acc):
                g = gather_fn(t, jax.lax.rem(i + k, big_rows))
                return acc + jnp.sum(g.astype(jnp.float32))
            return lax.fori_loop(0, 8, body, jnp.float32(0))

        jax.device_get(run(tbl, gidx0))
        t0 = time.perf_counter()
        for _ in range(4):
            jax.device_get(run(tbl, gidx0))
        dt = (time.perf_counter() - t0) / 4
        rows_fetched = big_rows * 8
        print(f"xla gather {name:28s}: {dt*1e3:8.3f} ms/call -> "
              f"{dt/rows_fetched*1e9:6.2f} ns/row, "
              f"{rows_fetched*useful_bytes/dt/1e9:7.1f} GB/s useful",
              flush=True)

    time_case("(N,256) bf16 rows", base,
              lambda t, i: jnp.take_along_axis(t, i[:, None], axis=0),
              512)
    time_case("(N,128) bf16 half-rows", base[:, :128],
              lambda t, i: jnp.take_along_axis(t, i[:, None], axis=0),
              256)
    t_2x128 = base.reshape(big_rows, 2, 128)
    time_case("(N,2,128) bf16 slabs", t_2x128,
              lambda t, i: jnp.take_along_axis(
                  t, i[:, None, None], axis=0), 512)
    t_4x64 = base.reshape(big_rows, 4, 64)
    time_case("(N,4,64) bf16 slabs", t_4x64,
              lambda t, i: jnp.take_along_axis(
                  t, i[:, None, None], axis=0), 512)
    t_16x128 = jnp.concatenate([base] * 8, axis=-1).reshape(
        big_rows, 16, 128)
    time_case("(N,16,128) bf16 full tile", t_16x128,
              lambda t, i: jnp.take_along_axis(
                  t, i[:, None, None], axis=0), 4096)
    time_case("(N,256->2,128) int8 slabs",
              jnp.clip(jnp.round(base.astype(jnp.float32) * 50), -127,
                       127).astype(jnp.int8).reshape(big_rows, 2, 128),
              lambda t, i: jnp.take_along_axis(
                  t, i[:, None, None], axis=0), 256)
    return 0


if __name__ == "__main__":
    sys.exit(main())
