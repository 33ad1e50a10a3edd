"""Training checkpoint/resume (aux subsystem; SURVEY.md §5).

The reference's only persistence is on-disk .onnx weights; the TPU rebuild
trains, so it checkpoints: orbax-backed save/restore of the full train state
(params, optimizer state, step), with the .npz bundle export for serving
(the runtime's model_directory format).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

from ..utils.pytree_io import save_pytree


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(directory, step: int, params, opt_state) -> None:
    """Write checkpoint `directory/step_<N>` (atomic, orbax)."""
    ocp = _ocp()
    path = Path(directory).absolute() / f"step_{step}"
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, {"params": params, "opt_state": opt_state,
                          "step": np.int64(step)}, force=True)


def latest_step(directory) -> Optional[int]:
    d = Path(directory)
    if not d.is_dir():
        return None
    steps = [int(p.name.split("_", 1)[1]) for p in d.iterdir()
             if p.name.startswith("step_") and p.name.split("_", 1)[1].isdigit()]
    return max(steps) if steps else None


def restore_train_state(directory, step: Optional[int] = None,
                        like: Optional[Any] = None,
                        tcfg=None) -> Tuple[Any, Any, int]:
    """Restore (params, opt_state, step). `like` (a matching pytree of
    arrays) restores with correct dtypes/shardings when provided; otherwise
    the optimizer-state STRUCTURE is rebuilt from the restored params
    (orbax returns plain dicts/lists for optax's NamedTuple states, which
    `optax.update` cannot consume — caught by the resume path of
    examples/finetune_decoder.py in test_examples.py)."""
    ocp = _ocp()
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = Path(directory).absolute() / f"step_{step}"
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is not None:
            # Shardings come from `like`, not the checkpoint: restoring a
            # multi-host/multi-device state puts every shard straight onto
            # its mesh position (each process reads only its addressable
            # shards — the multi-host resume path, tests/_multihost_worker).
            def _ra(x):
                if isinstance(x, jax.Array):
                    return ocp.ArrayRestoreArgs(sharding=x.sharding,
                                                global_shape=x.shape,
                                                dtype=x.dtype)
                return ocp.RestoreArgs()

            restored = ckptr.restore(
                path, item=like,
                restore_args=jax.tree_util.tree_map(_ra, like))
        else:
            # Restore as host numpy (no sharding spec required); callers
            # device_put with parallel.mesh shardings for multi-chip resume.
            meta = ckptr.metadata(path).item_metadata.tree
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            restored = ckptr.restore(path, restore_args=restore_args)
    params, opt_state = restored["params"], restored["opt_state"]
    if like is None:
        from .step import TrainConfig, init_train_state

        template = jax.eval_shape(
            lambda p: init_train_state(p, tcfg or TrainConfig()), params)
        tdef = jax.tree_util.tree_structure(template)
        leaves = jax.tree_util.tree_leaves(opt_state)
        # NamedTuple fields serialize under their field names and optax's
        # states (ScaleByAdamState: count/mu/nu) have alphabetical ==
        # declaration order, so the flattened leaf order is preserved.
        assert len(leaves) == tdef.num_leaves, (
            f"checkpoint opt_state has {len(leaves)} leaves, optimizer "
            f"expects {tdef.num_leaves} — was it saved with a different "
            f"optimizer? Pass `like=` to restore into a custom structure")
        opt_state = jax.tree_util.tree_unflatten(tdef, leaves)
    return params, opt_state, int(restored["step"])


def export_serving_bundle(params, out_path) -> None:
    """Export trained params as the runtime's .npz bundle
    (model_directory/segmentation/<name>.npz)."""
    os.makedirs(Path(out_path).parent, exist_ok=True)
    save_pytree(out_path, jax.tree_util.tree_map(np.asarray, params))
