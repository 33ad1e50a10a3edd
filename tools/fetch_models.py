#!/usr/bin/env python
"""Fetch upstream checkpoints and convert them to pinned .npz bundles.

The analog of the reference's hash-pinned model downloads
(/root/reference/models/segmentation/CMakeLists.txt:1-33): one command turns
upstream checkpoints into the `<model_dir>/segmentation/*.npz` bundles the
runtime loads, each with a `<bundle>.sha256` pin that
Environment._verified_load enforces at load time.

Usage (network required for --fetch):
    python tools/fetch_models.py --list
    python tools/fetch_models.py mobile_sam --model-dir models
    python tools/fetch_models.py all --model-dir models
    python tools/fetch_models.py mobile_sam --checkpoint /path/mobile_sam.pt \
        --model-dir models         # offline: convert a local checkpoint

Source integrity: SAM checkpoints from facebookresearch/segment-anything
embed the first 6 hex chars of their MD5 in the filename — those are
pinned below and always verified (MD5 here detects corruption/substitution
of a known artifact, it is not a collision-resistance claim; the converted
bundle gets a full sha256 pin). Checkpoints without a published hash are
trust-on-first-use: the sha256 of the first download is recorded next to the
cached file and enforced on every later fetch.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import hashlib
import sys
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, Optional


@dataclass(frozen=True)
class ModelSpec:
    name: str                    # runtime bundle name (SAM_BUNDLES key / birefnet kind)
    url: str                     # upstream checkpoint URL
    bundle: str                  # output filename under <model_dir>/segmentation/
    converter: str               # dotted function in dlimgedit_tpu.convert
    sha256: Optional[str] = None          # full pin when published upstream
    sha256_prefix: Optional[str] = None   # partial sha256 pin
    md5_prefix: Optional[str] = None      # partial MD5 pin (the SAM
    #                                       filename fragment is MD5-derived)
    kwargs: Dict = field(default_factory=dict)


MANIFEST = {
    "mobile_sam": ModelSpec(
        name="mobile_sam",
        url="https://github.com/ChaoningZhang/MobileSAM/raw/master/weights/mobile_sam.pt",
        bundle="mobile_sam.npz",
        converter="mobile_sam.convert_checkpoint",
    ),
    "vit_b": ModelSpec(
        name="vit_b",
        url="https://dl.fbaipublicfiles.com/segment_anything/sam_vit_b_01ec64.pth",
        bundle="sam_vit_b.npz",
        converter="mobile_sam.convert_checkpoint",
        md5_prefix="01ec64",
        kwargs={"variant": "vit_b"},
    ),
    "vit_l": ModelSpec(
        name="vit_l",
        url="https://dl.fbaipublicfiles.com/segment_anything/sam_vit_l_0b3195.pth",
        bundle="sam_vit_l.npz",
        converter="mobile_sam.convert_checkpoint",
        md5_prefix="0b3195",
        kwargs={"variant": "vit_l"},
    ),
    "vit_h": ModelSpec(
        name="vit_h",
        url="https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth",
        bundle="sam_vit_h.npz",
        converter="mobile_sam.convert_checkpoint",
        md5_prefix="4b8939",
        kwargs={"variant": "vit_h"},
    ),
    "birefnet": ModelSpec(
        name="general",
        url=("https://huggingface.co/ZhengPeng7/BiRefNet_lite/resolve/main/"
             "BiRefNet_lite-general-epoch_232.pth"),
        bundle="birefnet_general.npz",
        converter="birefnet.convert_checkpoint",
    ),
}


def sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def md5_file(path: Path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_source(spec: ModelSpec, path: Path, cache_pin: Path) -> str:
    """Check a downloaded checkpoint against its pin; returns the sha256
    digest. Raises ValueError on mismatch."""
    digest = sha256_file(path)
    if spec.sha256 and digest != spec.sha256:
        raise ValueError(f"{path.name}: sha256 {digest} != pinned {spec.sha256}")
    if spec.sha256_prefix and not digest.startswith(spec.sha256_prefix):
        raise ValueError(
            f"{path.name}: sha256 {digest} does not start with pinned "
            f"prefix {spec.sha256_prefix}")
    if spec.md5_prefix and not md5_file(path).startswith(spec.md5_prefix):
        raise ValueError(
            f"{path.name}: md5 {md5_file(path)} does not start with pinned "
            f"prefix {spec.md5_prefix} (SAM checkpoints embed the first 6 "
            f"MD5 hex chars in the filename)")
    if cache_pin.exists():  # trust-on-first-use for unpinned sources
        prior = cache_pin.read_text().split()[0]
        if digest != prior:
            raise ValueError(
                f"{path.name}: sha256 {digest} changed since first fetch "
                f"({prior}) — upstream file was replaced; delete "
                f"{cache_pin} only if this is intentional")
    else:
        cache_pin.write_text(f"{digest}  {path.name}\n")
    return digest


def fetch(spec: ModelSpec, cache_dir: Path) -> Path:
    cache_dir.mkdir(parents=True, exist_ok=True)
    dst = cache_dir / Path(spec.url).name
    if not dst.exists():
        print(f"fetching {spec.url}")
        tmp = dst.with_suffix(dst.suffix + ".part")
        urllib.request.urlretrieve(spec.url, tmp)  # noqa: S310 — pinned below
        tmp.rename(dst)
    verify_source(spec, dst, dst.with_suffix(dst.suffix + ".sha256"))
    return dst


def _load_state_dict(path: Path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj


def convert(key: str, checkpoint: Path, model_dir: Path) -> Path:
    import importlib

    import numpy as np

    spec = MANIFEST[key]
    mod_name, fn_name = spec.converter.rsplit(".", 1)
    mod = importlib.import_module(f"dlimgedit_tpu.convert.{mod_name}")
    fn: Callable = getattr(mod, fn_name)

    sd = _load_state_dict(checkpoint)
    params = fn(sd, **spec.kwargs)

    from dlimgedit_tpu.utils.pytree_io import save_pytree

    out = model_dir / "segmentation" / spec.bundle
    out.parent.mkdir(parents=True, exist_ok=True)
    save_pytree(out, params)
    out.with_suffix(out.suffix + ".sha256").write_text(
        f"{sha256_file(out)}  {out.name}\n")
    from dlimgedit_tpu.utils.pytree_io import flatten_tree

    n = sum(int(np.prod(a.shape)) for a in flatten_tree(params).values())
    print(f"wrote {out} ({n / 1e6:.1f}M params, pinned)")
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("model", nargs="?",
                    help=f"one of {sorted(MANIFEST)} or 'all'")
    ap.add_argument("--model-dir", type=Path, default=Path("models"))
    ap.add_argument("--cache-dir", type=Path, default=Path("models/_checkpoints"))
    ap.add_argument("--checkpoint", type=Path,
                    help="convert this local checkpoint instead of fetching")
    ap.add_argument("--list", action="store_true", help="print the manifest")
    args = ap.parse_args(argv)

    if args.list or not args.model:
        for k, s in MANIFEST.items():
            pin = (s.sha256 or (s.sha256_prefix and f"sha256:{s.sha256_prefix}…")
                   or (s.md5_prefix and f"md5:{s.md5_prefix}…") or "TOFU")
            print(f"{k:12s} {s.bundle:22s} pin={pin:10s} {s.url}")
        return 0

    keys = sorted(MANIFEST) if args.model == "all" else [args.model]
    for key in keys:
        if key not in MANIFEST:
            print(f"unknown model {key!r}; see --list", file=sys.stderr)
            return 2
        if args.checkpoint:
            # Local checkpoints are verified against the manifest pin too:
            # converting an unverified file would stamp a fresh .sha256 pin
            # onto bad weights that _verified_load then trusts forever.
            verify_source(MANIFEST[key], args.checkpoint,
                          args.checkpoint.with_suffix(
                              args.checkpoint.suffix + ".sha256"))
            ckpt = args.checkpoint
        else:
            ckpt = fetch(MANIFEST[key], args.cache_dir)
        convert(key, ckpt, args.model_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
