"""Encoder distillation: train a small SAM image encoder to mimic a big
one's embeddings — the recipe that produced the reference's own model.

The reference CONSUMES the distilled artifact (MobileSAM's TinyViT encoder,
downloaded as mobile_sam_image_encoder.onnx by
/root/reference/models/segmentation/CMakeLists.txt:2-16); this module is
the TPU-native producer side, so the framework can re-create — or improve
on — that artifact instead of depending on an upstream export. It follows
MobileSAM's decoupled distillation: freeze the teacher (SAM ViT-H), train
the student (TinyViT, or any smaller ViT variant) to match the teacher's
(B, G, G, 256) neck embeddings under MSE, then graft the teacher's prompt
encoder + mask decoder onto the student unchanged — the decoder never sees
which encoder produced the embedding.

Mesh story (TPU-native): the teacher is frozen, so teacher embedding is
inference — run it dp x tp sharded via parallel/batch.encode_frames (or
precompute embeddings offline: images never need the teacher resident
during the student's training). The student step itself shards the batch
over dp with gradients psum'd by GSPMD, same pattern as train/step.py.
Teacher and student never need device memory at the same time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import sam as sam_lib
from .step import learning_rate_schedule

__all__ = ["DistillConfig", "distill_loss", "init_distill_state",
           "make_distill_step", "place_distill_state", "teacher_embeddings",
           "graft_student"]


@dataclass(frozen=True)
class DistillConfig:
    learning_rate: float = 1e-3  # from-scratch student: full pretrain scale
    weight_decay: float = 0.01
    # Schedule semantics shared with train/step.TrainConfig (duck-typed into
    # learning_rate_schedule): warmup, then cosine over decay_steps AFTER
    # warmup; both 0 -> constant lr.
    warmup_steps: int = 0
    decay_steps: int = 0
    # Rematerialize the student forward in the backward pass.
    remat: bool = False
    # "bfloat16": bf16 shadows of the f32 masters for the forward/backward
    # (MXU-native rate); grads flow back f32. The MSE itself stays f32.
    compute_dtype: str = "float32"


def distill_loss(student_params, student_cfg: sam_lib.SamConfig,
                 batch: Dict[str, jnp.ndarray],
                 tcfg: DistillConfig = DistillConfig()
                 ) -> Tuple[jnp.ndarray, Dict]:
    """batch: images (B,S,S,3) preprocessed pixels, teacher_emb (B,G,G,256)
    frozen teacher embeddings (precomputed, or from teacher_embeddings)."""
    encode = sam_lib.encode_image
    if tcfg.remat:
        encode = jax.checkpoint(encode, static_argnums=(1,))
    run_params, images = student_params, batch["images"]
    if tcfg.compute_dtype == "bfloat16":
        run_params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, student_params)
        images = images.astype(jnp.bfloat16)
    emb = encode(run_params, student_cfg, images).astype(jnp.float32)
    target = jax.lax.stop_gradient(batch["teacher_emb"]).astype(jnp.float32)
    mse = jnp.mean((emb - target) ** 2)
    return mse, {"mse": mse}


def _make_optimizer(tcfg: DistillConfig):
    return optax.adamw(learning_rate_schedule(tcfg),
                       weight_decay=tcfg.weight_decay)


def init_distill_state(encoder_params, tcfg: DistillConfig = DistillConfig()):
    return _make_optimizer(tcfg).init(encoder_params)


def make_distill_step(student_cfg: sam_lib.SamConfig,
                      tcfg: DistillConfig = DistillConfig(),
                      donate: bool = True):
    """Build the jitted distillation step over the student's ENCODER subtree:
    (encoder_params, opt_state, batch) -> (encoder_params, opt_state, loss,
    aux). Only the encoder trains — the prompt encoder / decoder come from
    the teacher at graft time, exactly as in MobileSAM."""
    opt = _make_optimizer(tcfg)

    def loss_on_encoder(encoder_params, batch):
        return distill_loss({"encoder": encoder_params}, student_cfg, batch,
                            tcfg)

    grad_fn = jax.value_and_grad(loss_on_encoder, has_aux=True)

    def step(encoder_params, opt_state, batch):
        (loss, aux), grads = grad_fn(encoder_params, batch)
        updates, opt_state = opt.update(grads, opt_state, encoder_params)
        encoder_params = optax.apply_updates(encoder_params, updates)
        return encoder_params, opt_state, loss, aux

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def place_distill_state(encoder_params, opt_state, batch, mesh,
                        dp_axis: str = "dp"):
    """Student params/opt replicated (students are small by construction —
    that is the point of distilling), batch dp-sharded. The same jitted
    step then runs single-device or sharded; XLA inserts the gradient psum."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(dp_axis))
    encoder_params = jax.device_put(
        encoder_params,
        jax.tree_util.tree_map(lambda _: repl, encoder_params))
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x,
        opt_state)
    batch = {k: jax.device_put(v, dp) for k, v in batch.items()}
    return encoder_params, opt_state, batch


def teacher_embeddings(teacher_params, teacher_cfg: sam_lib.SamConfig,
                       images: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """Frozen-teacher embeddings for a batch of preprocessed images.

    With a mesh, runs dp x tp sharded (parallel/batch.encode_frames — the
    ViT-H teacher is where the FLOPs are); single-device otherwise. Always
    f32 with gradients stopped, ready to store or feed to the student step.
    """
    if mesh is not None:
        from ..parallel.batch import encode_frames

        emb = encode_frames(teacher_params, teacher_cfg, images, mesh=mesh)
    else:
        emb = sam_lib.encode_image(teacher_params, teacher_cfg, images)
    return jax.lax.stop_gradient(emb).astype(jnp.float32)


def graft_student(student_encoder_params, teacher_params) -> dict:
    """Assemble the servable distilled model: student encoder + the
    teacher's prompt encoder and mask decoder, untouched (MobileSAM's
    final assembly). The result is a full SAM param tree that drops into
    encode_image/decode_masks and the serving bundle exporter."""
    return {
        "encoder": student_encoder_params,
        "prompt_encoder": teacher_params["prompt_encoder"],
        "decoder": teacher_params["decoder"],
    }
