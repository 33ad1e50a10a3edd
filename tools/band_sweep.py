#!/usr/bin/env python
"""One-process interleaved A/B of ops/deform._BAND_PIXELS at high_res
(@2048 BiRefNet, exact deform) — the band-size sweep behind the number in
BENCH_NOTES round 4.  Same-process interleaving is the trusted
methodology (isolated runs swing ±20-30% through the tunnel).

Run (repo root, live relay, nothing else on the chip):
    python tools/band_sweep.py [--res N] [pixels ...]
    # default --res 2048, pixels 131072 65536 32768
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tpu_microbench import _bf16, _img, slope_ms  # noqa: E402


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    res = 2048
    if "--res" in argv:
        i = argv.index("--res")
        res = int(argv[i + 1])
        del argv[i:i + 2]
    sizes = [int(a) for a in argv] or [131072, 65536, 32768]
    dev = jax.devices()[0]
    print(f"device: {dev} (platform {dev.platform})", flush=True)

    from dlimgedit_tpu.models import birefnet
    from dlimgedit_tpu.ops import deform

    x = jax.device_put(_img(res), dev)
    cfg = birefnet.BiRefNetConfig(img_size=res)
    p = jax.device_put(_bf16(birefnet.init_birefnet(
        jax.random.PRNGKey(0), cfg)), dev)

    for rnd in range(2):                     # interleaved, two rounds
        for bp in sizes:
            deform._BAND_PIXELS = bp
            ms = slope_ms(lambda pp, xx, e: birefnet.birefnet_apply(
                pp, xx * (1 + e).astype(xx.dtype), cfg), (p, x))
            print(f"round {rnd} band_pixels={bp:7d}: {ms:8.2f} ms",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
