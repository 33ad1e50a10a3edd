"""Largest-connected-component selection, on-device.

The BASELINE north star asks for "largest-object selection for Region
queries" as part of the fused postprocess (the reference returns the raw box
prompt's mask). Implemented as a Shiloach-Vishkin-style union-find on the
mask grid, fully vectorised:

  * every foreground pixel is seeded with a unique id (flat index + 1, so a
    label doubles as a pointer to a pixel);
  * each sweep HOOKS: the 4-neighbourhood max is scatter-maxed onto the
    pixel each label currently points at (the local root), so new ids reach
    the root in one step instead of crawling pixel-by-pixel;
  * then POINTER-JUMPS: labels <- labels[labels], which both doubles the
    distance toward the component maximum and re-broadcasts whatever the
    root just learned to everything pointing at it.

Plain neighbour propagation needs O(path length) = O(H*W) sweeps on a
serpentine mask; hook+jump converges in O(log(H*W)) (measured: 10 sweeps on
a 512x512 worst-case boustrophedon, see test_ops.py). Component sizes are
then accumulated with one scatter-add and the largest component kept. All
shapes static; the sweeps are a VPU pass plus two gathers and one scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _propagate_once(labels: jnp.ndarray, mask: jnp.ndarray,
                    conn8: bool = False) -> jnp.ndarray:
    up = jnp.pad(labels[:-1, :], ((1, 0), (0, 0)))
    down = jnp.pad(labels[1:, :], ((0, 1), (0, 0)))
    left = jnp.pad(labels[:, :-1], ((0, 0), (1, 0)))
    right = jnp.pad(labels[:, 1:], ((0, 0), (0, 1)))
    m = jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right))
    if conn8:
        # Diagonal neighbours: shift the already-shifted rows sideways.
        ul = jnp.pad(up[:, :-1], ((0, 0), (1, 0)))
        ur = jnp.pad(up[:, 1:], ((0, 0), (0, 1)))
        dl = jnp.pad(down[:, :-1], ((0, 0), (1, 0)))
        dr = jnp.pad(down[:, 1:], ((0, 0), (0, 1)))
        m = jnp.maximum(m, jnp.maximum(jnp.maximum(ul, ur),
                                       jnp.maximum(dl, dr)))
    return jnp.where(mask, jnp.maximum(labels, m), 0)


def _label_components(mask: jnp.ndarray, max_iters: int = 64,
                      conn8: bool = False):
    """Label every 4-connected (8-connected with `conn8`) component of
    `mask` with the max pixel id it contains. Returns (labels (H, W) int32,
    sweep count int32).

    Invariant: a pixel's label is always the id of a pixel in its OWN
    component (ids are seeded per foreground pixel and only moved between
    4-neighbours, scattered onto in-component roots, or gathered from
    in-component pointees), and labels only grow — so the max-fixpoint is
    exactly "every pixel holds its component's max id".
    """
    H, W = mask.shape
    ids = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) + 1)
    labels = jnp.where(mask, ids, 0)
    fg = mask.ravel()

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        cand = _propagate_once(labels, mask, conn8).ravel()
        f = labels.ravel()
        # Hook: push the neighbourhood max onto the pixel this label points
        # at. (For fg pixels the target is always a fg pixel; bg pixels
        # scatter the harmless value 0.)
        f = f.at[jnp.maximum(f - 1, 0)].max(jnp.where(fg, cand, 0))
        f = jnp.where(fg, jnp.maximum(f, cand), 0)
        # Jump twice: follow the pointer and adopt its (just-updated) label.
        for _ in range(2):
            j = jnp.take(f, jnp.maximum(f - 1, 0), mode="clip")
            f = jnp.where(fg, jnp.maximum(f, j), 0)
        new = f.reshape(H, W)
        return new, jnp.any(new != labels), it + 1

    labels, _, iters = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0)))
    return labels, iters


def largest_component_mask(mask: jnp.ndarray, max_iters: int = 64
                           ) -> jnp.ndarray:
    """mask: (H, W) bool -> bool mask of its largest 4-connected component.

    Convergence is bounded at O(log(H*W)) sweeps by the hook+jump scheme
    (see module docstring); natural masks converge in a handful."""
    H, W = mask.shape
    labels, _ = _label_components(mask, max_iters)
    sizes = jnp.zeros((H * W + 1,), jnp.int32).at[labels.ravel()].add(
        mask.ravel().astype(jnp.int32))
    sizes = sizes.at[0].set(0)  # background
    biggest = jnp.argmax(sizes)
    return (labels == biggest) & mask
