"""int8 quantisation for encoder parameters (weight-only and s8 x s8).

The serving-efficiency analog of the reference shipping fp16 ONNX variants
for GPU (models/segmentation/CMakeLists.txt:24-28): 2D projection weights
(qkv / proj / MLP) are stored as int8 with per-output-channel scales and
dequantised into the matmul operand (XLA fuses the dequant into the MXU
read), halving the weight HBM traffic of the big ViT encoders. Norms,
biases, tables and convs stay in full precision. `act_int8` additionally
quantises activations per-token so projections run s8 x s8 -> s32 on the
MXU.

Measured on v5e @1024, batch 1 (round 2, slope method): neither mode
changes encode latency (TinyViT 6.8 bf16 / 6.8 w8 / 8.4 w8a8 ms — the
dynamic activation quant costs more VPU time than the int8 MXU saves at
these batch-1 shapes; ViT-B 25.6 / 25.6 / 26.7 ms — compute-bound in bf16).
The value of these modes here is MEMORY: int8 weights halve encoder HBM
residency (all four SAM variants + BiRefNet fit together comfortably),
and w8a8 is the right starting point for large-batch serving where the
MXU int8 rate dominates.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# Module names (exact last path segment) eligible for quantisation — the 2D
# matmul weights of attention/MLP blocks. Exact matching (not substring) so
# that e.g. a future conv module merely *containing* "proj" in its name can
# never be caught by accident.
QUANT_KEYS = frozenset({"qkv", "proj", "fc1", "fc2", "lin1", "lin2"})


def quantize_weight(w: jnp.ndarray):
    """w: (in, out) float -> (w_q int8 (in, out), scale f32 (out,)).

    Scales are ALWAYS derived from an f32 view of the weights — enforcing
    the "quantize before the bf16 cast" invariant here rather than relying
    on every call site's ordering (a bf16-rounded scale silently degrades
    the quantization)."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def dequantize_weight(w_q: jnp.ndarray, scale: jnp.ndarray, dtype):
    """Dequantise in f32 and round once to `dtype` (one rounding error
    instead of two; XLA still fuses the expansion into the consumer)."""
    return (w_q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)


def quantize_activations_int8(x: jnp.ndarray):
    """Dynamic per-token symmetric int8 activation quantisation.
    x: (..., C) float -> (q int8 (..., C), scale f32 (..., 1))."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(ax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """s8 x s8 -> s32 MXU matmul with dynamic per-token activation scales.

    The serving analog of the reference's fp16 GPU ONNX variant pushed one
    step further: int8 doubles MXU throughput on v5e vs bf16 and halves
    both operand streams. y = (q_x @ w_q8) * x_scale * w_scale + b."""
    q_x, x_scale = quantize_activations_int8(x)
    acc = jnp.dot(q_x, params["w_q8"], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * params["w_scale"].astype(jnp.float32)
    y = y.astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def quantize_encoder(params: Dict[str, Any],
                     act_int8: bool = False) -> Dict[str, Any]:
    """Return a copy of an encoder param tree with eligible linear weights
    replaced by {"w_q", "w_scale"} (weight-only int8) or {"w_q8", "w_scale"}
    (int8 weights AND dynamic int8 activations — the s8 x s8 MXU path). Both
    are consumed by models.common.linear, dispatched on the key name."""
    wkey = "w_q8" if act_int8 else "w_q"

    def walk(node, path=""):
        if isinstance(node, dict):
            if ("w" in node and not isinstance(node["w"], dict)
                    and getattr(node["w"], "ndim", 0) == 2
                    and path.rsplit("/", 1)[-1] in QUANT_KEYS):
                w_q, scale = quantize_weight(jnp.asarray(node["w"]))
                rest = {k: v for k, v in node.items() if k != "w"}
                return {**rest, wkey: w_q, "w_scale": scale}
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    return sum(a.nbytes for a in jax.tree_util.tree_leaves(params)
               if hasattr(a, "nbytes"))
