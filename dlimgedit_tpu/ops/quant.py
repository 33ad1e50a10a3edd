"""Weight-only int8 quantisation for encoder parameters.

The serving-efficiency analog of the reference shipping fp16 ONNX variants
for GPU (models/segmentation/CMakeLists.txt:24-28): 2D projection weights
(qkv / proj / MLP) are stored as int8 with per-output-channel scales and
dequantised into the matmul operand (XLA fuses the dequant into the MXU
read), halving the weight HBM traffic of the big ViT encoders. Norms,
biases, tables and convs stay in full precision.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# Parameter-path fragments eligible for quantisation (2D matmul weights).
QUANT_KEYS = ("qkv", "proj", "fc1", "fc2", "lin1", "lin2")


def quantize_weight(w: jnp.ndarray):
    """w: (in, out) float -> (w_q int8 (in, out), scale f32 (out,))."""
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dequantize_weight(w_q: jnp.ndarray, scale: jnp.ndarray, dtype):
    return w_q.astype(dtype) * scale.astype(dtype)


def quantize_encoder(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a copy of an encoder param tree with eligible linear weights
    replaced by {"w_q", "w_scale"} (consumed by models.common.linear)."""

    def walk(node, path=""):
        if isinstance(node, dict):
            if ("w" in node and not isinstance(node["w"], dict)
                    and getattr(node["w"], "ndim", 0) == 2
                    and any(k in path for k in QUANT_KEYS)):
                w_q, scale = quantize_weight(jnp.asarray(node["w"]))
                rest = {k: v for k, v in node.items() if k != "w"}
                return {**rest, "w_q": w_q, "w_scale": scale}
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    return sum(a.nbytes for a in jax.tree_util.tree_leaves(params)
               if hasattr(a, "nbytes"))
