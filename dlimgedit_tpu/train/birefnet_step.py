"""Sharded BiRefNet fine-tuning step (dichotomous foreground segmentation).

The reference ships BiRefNet as a frozen ONNX graph — inference only
(/root/reference/src/segmentation.cpp:221-242); this is the training
counterpart for adapting the matting model to new domains, completing the
train tier next to the SAM step (train/step.py). The loss is the upstream
BiRefNet recipe's final-map terms — pixel BCE + soft IoU on the
full-resolution logits (upstream weights them 30 : 0.5) — applied to
exactly the graph serving executes, so a fine-tuned bundle drops into
`segment_objects` unchanged.

Mesh story (TPU-native): BiRefNet is conv/window-local, so the natural
training axes compose the framework's existing ones — dp over images
(gradient psum rides ICI) times the SAME canvas-row sharding inference
uses (parallel/spatial.py): a 2-D ('dp', 'sp') mesh with the image batch
on dp and canvas ROWS on sp. GSPMD shards activations, not weights, so
params/optimizer state stay replicated and row halos ride
collective-permutes exactly as in the inference tier — which is what makes
@2048 training fit: activations are the dominant memory term and they
scale 1/(dp*sp) per chip (plus `remat_backbone` to retire the backbone's
activations entirely).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.birefnet import BiRefNetConfig, birefnet_apply
from .step import learning_rate_schedule

__all__ = ["BiRefNetTrainConfig", "birefnet_loss", "init_birefnet_train_state",
           "make_birefnet_train_step", "place_birefnet_train_state"]


@dataclass(frozen=True)
class BiRefNetTrainConfig:
    learning_rate: float = 1e-5  # fine-tune scale: the backbone is pretrained
    weight_decay: float = 0.01
    bce_weight: float = 30.0  # upstream BiRefNet loss config (lambdas_pix)
    iou_weight: float = 0.5
    # Same schedule semantics as train/step.TrainConfig (duck-typed into
    # learning_rate_schedule): warmup then cosine over decay_steps AFTER
    # warmup; both 0 -> constant lr.
    warmup_steps: int = 0
    decay_steps: int = 0
    # Rematerialize the forward in the backward pass (jax.checkpoint): at
    # real resolutions activations dominate training memory; recompute them
    # instead. Loss bit-identical, grads agree to rounding (tested).
    remat: bool = False
    # "bfloat16": run forward/backward on bf16 shadows of the f32 masters
    # (MXU-native rate, half the activation bytes); grads flow back f32.
    compute_dtype: str = "float32"


def _soft_iou_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU: 1 - (inter+1)/(union+1) on sigmoid probabilities, per image.

    The +1 smoothing (the standard BASNet-lineage form upstream BiRefNet's
    IoULoss derives from) is what makes empty-mask frames well-behaved: a
    correct near-zero prediction on an empty target gives loss -> 0, where
    the unsmoothed ratio is 0/0 (and a denominator clamp would report a
    constant loss of 1 with zero gradient for exactly the right answer)."""
    p = jax.nn.sigmoid(logits)
    inter = jnp.sum(p * targets, axis=(-3, -2, -1))
    union = (jnp.sum(p, axis=(-3, -2, -1))
             + jnp.sum(targets, axis=(-3, -2, -1)) - inter)
    return jnp.mean(1.0 - (inter + 1.0) / (union + 1.0))


def birefnet_loss(params, cfg: BiRefNetConfig, batch: Dict[str, jnp.ndarray],
                  tcfg: BiRefNetTrainConfig = BiRefNetTrainConfig()
                  ) -> Tuple[jnp.ndarray, Dict]:
    """batch: images (B,S,S,3) ImageNet-normalised, masks (B,S,S) in [0,1]
    (soft alpha targets are fine — BCE and soft-IoU both accept them)."""
    apply = birefnet_apply
    if tcfg.remat:
        apply = jax.checkpoint(birefnet_apply, static_argnums=(2,))
    run_params, images = params, batch["images"]
    if tcfg.compute_dtype == "bfloat16":
        # Differentiable cast: bf16 shadows for the forward/backward, f32
        # grads to adamw. Inputs cast too, else f32 operands silently
        # promote every matmul back to f32 compute (models/common.HIGHEST).
        run_params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params)
        images = images.astype(jnp.bfloat16)
    logits = apply(run_params, images, cfg).astype(jnp.float32)  # (B,S,S,1)
    targets = batch["masks"].astype(jnp.float32)[..., None]
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, targets))
    iou = _soft_iou_loss(logits, targets)
    loss = tcfg.bce_weight * bce + tcfg.iou_weight * iou
    return loss, {"bce": bce, "iou": iou}


def _make_optimizer(tcfg: BiRefNetTrainConfig):
    return optax.adamw(learning_rate_schedule(tcfg),
                       weight_decay=tcfg.weight_decay)


def init_birefnet_train_state(params,
                              tcfg: BiRefNetTrainConfig = BiRefNetTrainConfig()):
    return _make_optimizer(tcfg).init(params)


def make_birefnet_train_step(cfg: BiRefNetConfig,
                             tcfg: BiRefNetTrainConfig = BiRefNetTrainConfig(),
                             donate: bool = True):
    """Build the jitted train step: (params, opt_state, batch) ->
    (params, opt_state, loss, aux).

    Sharding rides on the data (same pattern as train/step.py): place the
    state with place_birefnet_train_state and the SAME jitted step runs
    single-device or over any ('dp',)/('dp','sp') mesh — XLA inserts the
    gradient psum over dp and the row halo exchanges over sp."""
    opt = _make_optimizer(tcfg)
    grad_fn = jax.value_and_grad(birefnet_loss, has_aux=True)

    def step(params, opt_state, batch):
        (loss, aux), grads = grad_fn(params, cfg, batch, tcfg)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def place_birefnet_train_state(params, opt_state, batch, mesh,
                               dp_axis: str = "dp", sp_axis: str = "sp"):
    """Place state on a ('dp',) or ('dp','sp') mesh: params/opt replicated
    (BiRefNet is ~85 MB bf16 — activations, not weights, are the memory
    term), images/masks batch-sharded over dp and canvas-row-sharded over
    sp when the mesh has that axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, jax.tree_util.tree_map(
        lambda _: repl, params))
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
        opt_state)
    sp = sp_axis if sp_axis in mesh.shape else None
    # images/masks are canvases: batch over dp, canvas rows over sp. Any
    # other batch entry (per-pixel weights, sample ids, ...) is plain
    # batch-sharded over dp, matching train/step.place_train_state.
    spec = {"images": P(dp_axis, sp), "masks": P(dp_axis, sp)}
    batch = {k: jax.device_put(v, NamedSharding(mesh, spec.get(k, P(dp_axis))))
             for k, v in batch.items()}
    return params, opt_state, batch
