"""Sharded SAM fine-tuning step (decoder fine-tune / distillation).

The reference is inference-only (SURVEY.md §5: no training, no checkpoint);
this module is the TPU-native training counterpart used for adapting the
mask decoder to new domains (the standard SAM fine-tuning recipe: focal +
dice loss on mask logits, MSE on predicted IoU) and for the multi-chip
dry-run: the full step — encoder forward, decoder forward, backward, optax
update — jits over a (dp, tp) mesh with GSPMD shardings from parallel/mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import sam as sam_lib
from ..parallel.mesh import batch_sharding, replicated, sam_param_sharding


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    dice_weight: float = 1.0
    focal_weight: float = 20.0
    iou_weight: float = 1.0
    # Learning-rate schedule: linear warmup over `warmup_steps`, then cosine
    # decay over `decay_steps` counted AFTER warmup (decay_steps=0 holds the
    # peak lr; both 0 -> constant lr). Enabling a schedule
    # adds a step counter to the optimizer state — restore checkpoints with
    # the same TrainConfig (restore_train_state's leaf-count assert catches
    # a mismatch).
    warmup_steps: int = 0
    decay_steps: int = 0
    # Rematerialize the image encoder in the backward pass (jax.checkpoint):
    # encoder activations — the dominant training-memory term at real
    # resolutions — are recomputed instead of stored, trading one extra
    # encoder forward for the whole activation footprint. Loss is
    # bit-identical; gradients agree to rounding (tested to 1e-7).
    remat_encoder: bool = False
    # Mixed precision (the standard TPU policy): run the ENCODER forward/
    # backward on bf16 copies of the f32 master weights — activations and
    # matmuls hit the MXU's native bf16 rate and halve activation bytes —
    # while gradients flow back through the cast in f32 and adamw updates
    # the f32 masters. Loss terms and the small decoder stay f32.
    encoder_dtype: str = "float32"  # "bfloat16" for mixed precision


def _focal_loss(logits, targets, alpha, gamma):
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(a_t * (1 - p_t) ** gamma * ce)


def _dice_loss(logits, targets, eps=1.0):
    p = jax.nn.sigmoid(logits)
    num = 2 * jnp.sum(p * targets, axis=(-2, -1)) + eps
    den = jnp.sum(p, axis=(-2, -1)) + jnp.sum(targets, axis=(-2, -1)) + eps
    return jnp.mean(1 - num / den)


def mask_loss(params, cfg: sam_lib.SamConfig, batch: Dict[str, jnp.ndarray],
              tcfg: TrainConfig = TrainConfig()) -> Tuple[jnp.ndarray, Dict]:
    """batch: images (B,S,S,3) preprocessed, point_coords (B,2,2),
    point_labels (B,2), masks (B,L,L) binary targets at low-res."""
    encode = sam_lib.encode_image
    if tcfg.remat_encoder:
        encode = jax.checkpoint(encode, static_argnums=(1,))
    enc_params = params
    images = batch["images"]
    if tcfg.encoder_dtype == "bfloat16":
        # bf16 shadow of the f32 masters for the forward/backward; the
        # astype is differentiable, so grads return in f32 to adamw.
        # Inputs are cast too — a f32 operand would silently promote every
        # matmul back to f32 compute. Only the encoder subtree is shadowed
        # (the decoder/prompt-encoder run f32).
        enc_params = {**params, "encoder": jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params["encoder"])}
        images = images.astype(jnp.bfloat16)
    emb = encode(enc_params, cfg, images)
    pred, iou_pred = sam_lib.decode_masks(
        params, cfg, emb.astype(jnp.float32), batch["point_coords"],
        batch["point_labels"], multimask=False)
    logits = pred[:, 0]  # (B, L, L)
    targets = batch["masks"].astype(jnp.float32)
    focal = _focal_loss(logits, targets, tcfg.focal_alpha, tcfg.focal_gamma)
    dice = _dice_loss(logits, targets)
    # IoU head regression against the actual IoU of the predicted mask.
    pred_bin = (logits > 0).astype(jnp.float32)
    inter = jnp.sum(pred_bin * targets, axis=(-2, -1))
    union = jnp.sum(jnp.maximum(pred_bin, targets), axis=(-2, -1))
    actual_iou = inter / jnp.maximum(union, 1.0)
    iou_l = jnp.mean((iou_pred[:, 0] - actual_iou) ** 2)
    loss = (tcfg.focal_weight * focal + tcfg.dice_weight * dice
            + tcfg.iou_weight * iou_l)
    return loss, {"focal": focal, "dice": dice, "iou_mse": iou_l}


def learning_rate_schedule(tcfg: TrainConfig = TrainConfig()):
    """Scalar lr, or warmup->cosine schedule when the config asks for one.

    `decay_steps` counts steps AFTER warmup (unlike optax's
    warmup_cosine_decay_schedule, whose decay_steps is the total length
    including warmup — that semantics collapses the lr to 0 one step after
    warmup for warmup-only configs). decay_steps=0 holds peak lr after
    warmup."""
    if not (tcfg.warmup_steps or tcfg.decay_steps):
        return tcfg.learning_rate
    if tcfg.decay_steps:
        tail = optax.cosine_decay_schedule(tcfg.learning_rate,
                                           tcfg.decay_steps)
    else:
        tail = optax.constant_schedule(tcfg.learning_rate)
    if not tcfg.warmup_steps:
        # Decay-only config: start the cosine at peak immediately (a forced
        # 1-step warmup would train step 0 at lr=0).
        return tail
    warmup = optax.linear_schedule(0.0, tcfg.learning_rate,
                                   tcfg.warmup_steps)
    return optax.join_schedules([warmup, tail], [tcfg.warmup_steps])


def make_optimizer(tcfg: TrainConfig = TrainConfig()):
    return optax.adamw(learning_rate_schedule(tcfg),
                       weight_decay=tcfg.weight_decay)


def init_train_state(params, tcfg: TrainConfig = TrainConfig()):
    return make_optimizer(tcfg).init(params)


def make_train_step(cfg: sam_lib.SamConfig, tcfg: TrainConfig = TrainConfig(),
                    mesh=None, donate: bool = True, accum_steps: int = 1):
    """Build the jitted (optionally mesh-sharded) train step.

    With a mesh: params/opt-state take the tensor-parallel shardings from
    parallel/mesh (Megatron column/row pattern), the batch is dp-sharded, and
    XLA inserts all ICI collectives (gradient psum over dp rides the mesh).

    `accum_steps > 1`: gradient accumulation — the batch (leading dim B,
    B % accum_steps == 0) is split into microbatches scanned inside the ONE
    jitted step; activations live for one microbatch while gradients
    accumulate in a single param-sized buffer, so the effective batch can
    exceed what activation memory allows. The update equals the full-batch
    update exactly (every loss term is a microbatch mean of equal-sized
    groups; keep B/accum_steps divisible by the mesh dp for clean
    shardings).
    """
    opt = make_optimizer(tcfg)
    grad_fn = jax.value_and_grad(mask_loss, has_aux=True)

    def step(params, opt_state, batch):
        if accum_steps == 1:
            (loss, aux), grads = grad_fn(params, cfg, batch, tcfg)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                    + x.shape[1:]), batch)

            def body(acc, mb):
                g_acc, loss_acc, aux_acc = acc
                (l, a), g = grad_fn(params, cfg, mb, tcfg)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, a)
                return (g_acc, loss_acc + l, aux_acc), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            # Aux accumulator structure comes from the loss itself so a new
            # aux metric can never be silently dropped on this path only.
            mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
            aux_tmpl = jax.eval_shape(
                lambda p, b: mask_loss(p, cfg, b, tcfg)[1], params, mb0)
            aux0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), aux_tmpl)
            (grads, loss, aux), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0.0), aux0), micro)
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
            aux = jax.tree_util.tree_map(lambda v: v * inv, aux)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def place_train_state(params, opt_state, batch, mesh):
    """Place params / optimizer state / batch on the mesh with the GSPMD
    shardings from parallel/mesh (Megatron tp for big projections, dp for the
    batch). The jitted step inherits these shardings from its inputs and XLA
    inserts all collectives — the idiomatic "shardings ride on the data"
    pattern (no per-optimizer sharding trees to maintain)."""
    p_shard = sam_param_sharding(params, mesh)
    p_struct = jax.tree_util.tree_structure(params)
    params = jax.device_put(params, p_shard)

    def place_opt(node):
        if hasattr(node, "_fields"):  # optax NamedTuple state
            return type(node)(*(place_opt(x) for x in node))
        if isinstance(node, tuple):
            return tuple(place_opt(x) for x in node)
        if isinstance(node, (dict, list)):
            # Adam mu/nu mirror the param tree -> reuse the param shardings.
            if jax.tree_util.tree_structure(node) == p_struct:
                return jax.device_put(node, p_shard)
            return jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, replicated(mesh)), node)
        return jax.device_put(node, replicated(mesh))

    opt_state = place_opt(opt_state)
    batch = {
        k: jax.device_put(v, batch_sharding(mesh, v.ndim))
        for k, v in batch.items()
    }
    return params, opt_state, batch
