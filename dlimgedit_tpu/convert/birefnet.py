"""BiRefNet checkpoint conversion — Swin backbone mapper.

Offline tool. Upstream BiRefNet checkpoints (ZhengPeng7/BiRefNet; exported
as the reference's birefnet_*.onnx, models/segmentation/CMakeLists.txt:19-28)
embed a standard Swin-v1 backbone under `bb.*`. This converter maps that
backbone onto models/swin.py's pytree. The decoder head of this framework is
a documented TPU-native simplification of the upstream decoder (see
models/birefnet.py), so decoder weights are NOT converted — fine-tune the
decoder with train/ against the converted backbone, or extend `DECODER_TODO`
when full upstream-decoder parity lands.

Swin layout mapping (torch microsoft/Swin-Transformer naming):
  patch_embed.proj (conv OIHW) + patch_embed.norm
  layers.{i}.blocks.{j}.norm1 / attn.{qkv,proj,relative_position_bias_table}
                     / norm2 / mlp.{fc1,fc2}
  layers.{i}.downsample.{norm,reduction}
The relative-position index construction in models/swin._rel_pos_index is
the standard one, so `relative_position_bias_table` drops in unchanged.
"""

from __future__ import annotations

import sys
from typing import Any, Dict

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _lin(sd, prefix):
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def convert_swin_backbone(sd, prefix="bb.", depths=(2, 2, 6, 2)
                          ) -> Dict[str, Any]:
    """Standard torch Swin-v1 state dict -> models/swin.py pytree."""
    p = prefix
    params: Dict[str, Any] = {
        "patch_embed": {
            "w": _np(sd[f"{p}patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "b": _np(sd[f"{p}patch_embed.proj.bias"]),
            "norm": _ln(sd, f"{p}patch_embed.norm"),
        },
        "stages": [],
    }
    for i in range(len(depths)):
        blocks = []
        for j in range(depths[i]):
            b = f"{p}layers.{i}.blocks.{j}"
            blocks.append({
                "norm1": _ln(sd, f"{b}.norm1"),
                "qkv": _lin(sd, f"{b}.attn.qkv"),
                "proj": _lin(sd, f"{b}.attn.proj"),
                "rel_bias": _np(sd[f"{b}.attn.relative_position_bias_table"]),
                "norm2": _ln(sd, f"{b}.norm2"),
                "mlp": {"lin1": _lin(sd, f"{b}.mlp.fc1"),
                        "lin2": _lin(sd, f"{b}.mlp.fc2")},
            })
        stage: Dict[str, Any] = {"blocks": blocks}
        # BiRefNet taps per-stage outputs through `norm{i}` layers when
        # present; otherwise identity norms.
        norm_key = f"{p}norm{i}"
        if f"{norm_key}.weight" in sd:
            stage["out_norm"] = _ln(sd, norm_key)
        else:
            dim = blocks[0]["norm1"]["scale"].shape[0]
            stage["out_norm"] = {"scale": np.ones(dim, np.float32),
                                 "bias": np.zeros(dim, np.float32)}
        if i < len(depths) - 1:
            d = f"{p}layers.{i}.downsample"
            stage["downsample"] = {
                "norm": _ln(sd, f"{d}.norm"),
                "reduction": {"w": _np(sd[f"{d}.reduction.weight"]).T},
            }
        params["stages"].append(stage)
    return params


def main(argv=None):
    argv = argv or sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    import torch

    from ..models.birefnet import BiRefNetConfig, init_birefnet
    from ..utils.pytree_io import save_pytree

    sd = torch.load(argv[0], map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    cfg = BiRefNetConfig()
    import jax

    params = init_birefnet(jax.random.PRNGKey(0), cfg)  # decoder stays init
    params["backbone"] = convert_swin_backbone(sd)
    save_pytree(argv[1], params)
    print(f"wrote {argv[1]} (backbone converted; decoder randomly "
          f"initialised — fine-tune with dlimgedit_tpu.train)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
