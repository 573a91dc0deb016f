"""Densification and pruning as static-shape recompaction.

The reference mutates tensors and performs optimizer-state "surgery" every
densification step (/root/reference/scene/gaussian_model.py:263-409). Under
XLA that would retrace constantly, so here densify/clone/split/prune is a
RECOMPACTION: compute boolean masks, then scatter (kept | clones | split
children) into fresh fixed-capacity arrays. Capacity is chosen host-side by
bucketed rounding, so jit caches are reused; the jitted recompaction itself is
shape-static per (in_capacity, out_capacity) pair.

Semantics (matching the reference):
  * accumulate ||grad_means2D||_ndc over visible Gaussians + max screen radius
    (gaussian_model.py:411-413, train.py:296-300)
  * clone:  avg grad >= tau  and  max(scale) <= percent_dense * extent
            -> copy (gaussian_model.py:379-392)
  * split:  avg grad >= tau  and  max(scale) >  percent_dense * extent
            -> 2 children sampled from the Gaussian, scales / 1.6, parent
            pruned (gaussian_model.py:354-377)
  * prune:  opacity < 0.005, or screen radius > max_screen_size, or world
            scale > 0.1 * extent (when max_screen_size set)
            (gaussian_model.py:394-409)
  * new entries start with zeroed Adam moments; kept entries keep theirs
    (cat_tensors_to_optimizer, gaussian_model.py:312-332)
  * opacity reset clamps opacity to <= 0.01 and zeroes the opacity Adam state
    (reset_opacity + replace_tensor_to_optimizer, gaussian_model.py:215-218,
    263-276)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import geometry
from .gaussians import DensifyStats, GaussianField, inverse_sigmoid, round_capacity
from .optim import PARAM_LEAVES, AdamState


def update_stats(
    stats: DensifyStats,
    means2d_grad: jax.Array,   # [C, 2] cotangent of the screen-space tap (px)
    radii: jax.Array,          # [C] int32
    image_height: int,
    image_width: int,
) -> DensifyStats:
    """Accumulate positional-gradient stats for visible Gaussians.

    The reference accumulates ||grad|| of NDC-scaled screenspace points
    (train.py:296-300 via add_densification_stats); our tap is in pixels, so
    scale by (W/2, H/2) to keep densify_grad_threshold=0.0002 compatible.

    Single-view convenience over the canonical contribution/apply pair
    (one formula — the trainers reduce stats_contribution across views and
    fold with apply_stats).
    """
    return apply_stats(
        stats,
        *stats_contribution(means2d_grad, radii, image_height, image_width))


def stats_contribution(
    means2d_grad: jax.Array,   # [C, 2] cotangent of the screen-space tap (px)
    radii: jax.Array,          # [C] int32
    image_height: int,
    image_width: int,
):
    """Per-VIEW densify-stat contributions, for data-parallel reduction.

    Returns (norm, vis, radii_f): psum the first two and pmax the third
    across the camera batch, then fold with `apply_stats`. This preserves
    the sequential trainer's semantics exactly — D views accumulate D
    per-view gradient norms and D visibility counts — where a naive
    psum-then-norm would let opposing views cancel and count denom once
    (round-1 advisor finding, sharded_step.py:94)."""
    vis = radii > 0
    g = means2d_grad * jnp.array(
        [image_width * 0.5, image_height * 0.5], means2d_grad.dtype)
    norm = jnp.linalg.norm(g, axis=-1)
    return (jnp.where(vis, norm, 0.0), vis.astype(jnp.float32),
            jnp.where(vis, radii, 0).astype(jnp.float32))


def apply_stats(stats: DensifyStats, norm_sum, vis_sum, radii_max) -> DensifyStats:
    """Fold reduced per-view contributions into the running stats."""
    return DensifyStats(
        max_radii2d=jnp.maximum(stats.max_radii2d, radii_max),
        xyz_gradient_accum=stats.xyz_gradient_accum + norm_sum,
        denom=stats.denom + vis_sum,
    )


def _gather_field(field: GaussianField, idx: jax.Array, valid: jax.Array) -> GaussianField:
    out = {k: getattr(field, k)[idx] for k in PARAM_LEAVES}
    return GaussianField(valid=valid, **out)


def densify_masks(
    field: GaussianField,
    stats: DensifyStats,
    grad_threshold: float,
    percent_dense: float,
    extent: float,
    min_opacity: float = 0.005,
    max_screen_size: int = 0,
):
    """Boolean decision masks (clone, split, prune) over the capacity axis."""
    avg_grad = stats.xyz_gradient_accum / jnp.maximum(stats.denom, 1.0)
    high_grad = (avg_grad >= grad_threshold) & field.valid
    max_scale = jnp.max(field.scales(), axis=1)

    small = max_scale <= percent_dense * extent
    clone = high_grad & small
    split = high_grad & ~small

    opacity = jax.nn.sigmoid(field.opacity_logit[:, 0])
    prune = (opacity < min_opacity) & field.valid
    if max_screen_size > 0:
        prune = prune | (
            field.valid
            & (
                (stats.max_radii2d > max_screen_size)
                | (max_scale > 0.1 * extent)
            )
        )
    # split parents are removed after their children are created
    return clone, split, prune


@functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1))
def _recompact(
    field: GaussianField,
    opt: AdamState,
    masks,
    out_capacity: int,
    key: jax.Array,
    split_scale_div: float = 1.6,
    n_split_children: int = 2,
):
    clone, split, prune = masks
    cin = field.capacity
    keep = field.valid & ~prune & ~split

    # Output slot assignment: [kept | clones | split children x2]
    keep_pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_keep = jnp.sum(keep.astype(jnp.int32))
    clone_pos = n_keep + jnp.cumsum(clone.astype(jnp.int32)) - 1
    n_clone = jnp.sum(clone.astype(jnp.int32))
    split_rank = jnp.cumsum(split.astype(jnp.int32)) - 1
    split_base = n_keep + n_clone + n_split_children * split_rank

    def scatter_rows(dst, src, pos, mask):
        pos = jnp.where(mask, pos, out_capacity)
        return dst.at[pos].set(src, mode="drop")

    # Split children: sample positions from the parent Gaussian.
    scales = field.scales()
    rots = geometry.quat_to_rotmat(field.quats)
    noise = (
        jax.random.normal(key, (n_split_children, cin, 3)) * scales[None, :, :]
    )
    child_means = field.means[None] + jnp.einsum("nij,knj->kni", rots, noise)
    child_log_scales = field.log_scales - jnp.log(split_scale_div)

    out_params = {}
    zeros_params = {}
    for name in PARAM_LEAVES:
        src = getattr(field, name)
        dst = jnp.zeros((out_capacity,) + src.shape[1:], src.dtype)
        dst = scatter_rows(dst, src, keep_pos, keep)
        dst = scatter_rows(dst, src, clone_pos, clone)
        for k in range(n_split_children):
            if name == "means":
                child = child_means[k]
            elif name == "log_scales":
                child = child_log_scales
            else:
                child = src
            dst = scatter_rows(dst, child, split_base + k, split)
        out_params[name] = dst
        zeros_params[name] = jnp.zeros_like(dst)

    n_total = n_keep + n_clone + n_split_children * jnp.sum(split.astype(jnp.int32))
    new_valid = jnp.arange(out_capacity) < jnp.minimum(n_total, out_capacity)
    new_field = GaussianField(valid=new_valid, **out_params)

    # Optimizer moments: kept rows keep their state, new rows start at zero.
    def carry_state(tree: GaussianField) -> GaussianField:
        out = {}
        for name in PARAM_LEAVES:
            src = getattr(tree, name)
            dst = jnp.zeros((out_capacity,) + src.shape[1:], src.dtype)
            dst = scatter_rows(dst, src, keep_pos, keep)
            out[name] = dst
        return GaussianField(valid=new_valid, **out)

    new_opt = AdamState(
        mu=carry_state(opt.mu), nu=carry_state(opt.nu), count=opt.count
    )
    new_stats = DensifyStats.zeros(out_capacity)
    return new_field, new_opt, new_stats, n_total


def densify_and_prune(
    field: GaussianField,
    opt: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    *,
    grad_threshold: float,
    percent_dense: float,
    extent: float,
    min_opacity: float = 0.005,
    max_screen_size: int = 0,
    capacity_headroom: float = 1.0,
) -> tuple[GaussianField, AdamState, DensifyStats, int]:
    """Host-driven densify step: decide masks, pick an output capacity bucket,
    run the jitted recompaction. Returns (field, opt_state, stats, n_active)."""
    masks = densify_masks(
        field, stats, grad_threshold, percent_dense, extent,
        min_opacity, max_screen_size,
    )
    clone, split, prune = masks
    keep = field.valid & ~prune & ~split
    n_out = int(
        jnp.sum(keep.astype(jnp.int32))
        + jnp.sum(clone.astype(jnp.int32))
        + 2 * jnp.sum(split.astype(jnp.int32))
    )
    out_capacity = round_capacity(int(n_out * capacity_headroom) + 1)
    new_field, new_opt, new_stats, n_total = _recompact(
        field, opt, masks, out_capacity, key
    )
    return new_field, new_opt, new_stats, int(n_total)


def prune_only(
    field: GaussianField,
    opt: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    *,
    min_opacity: float = 0.005,
    max_screen_size: int = 0,
    extent: float = 0.0,
) -> tuple[GaussianField, AdamState, DensifyStats, int]:
    """Pruning pass without densification (same recompaction machinery)."""
    false = jnp.zeros((field.capacity,), bool)
    _, _, prune = densify_masks(
        field, stats, jnp.inf, 1.0, max(extent, 1e-9), min_opacity, max_screen_size
    )
    masks = (false, false, prune)
    keep_n = int(jnp.sum((field.valid & ~prune).astype(jnp.int32)))
    out_capacity = round_capacity(keep_n + 1)
    new_field, new_opt, new_stats, n_total = _recompact(
        field, opt, masks, out_capacity, key
    )
    return new_field, new_opt, new_stats, int(n_total)


def reset_opacity(field: GaussianField, opt: AdamState,
                  ceiling: float = 0.01) -> tuple[GaussianField, AdamState]:
    """Clamp all opacities to <= ceiling and zero the opacity Adam moments
    (reference reset_opacity, gaussian_model.py:215-218)."""
    new_logit = jnp.minimum(
        field.opacity_logit, jnp.float32(inverse_sigmoid(ceiling))
    )
    return (
        field.replace(opacity_logit=new_logit),
        AdamState(
            mu=opt.mu.replace(opacity_logit=jnp.zeros_like(opt.mu.opacity_logit)),
            nu=opt.nu.replace(opacity_logit=jnp.zeros_like(opt.nu.opacity_logit)),
            count=opt.count,
        ),
    )
