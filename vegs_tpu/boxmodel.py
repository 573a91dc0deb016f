"""Dynamic-object box transforms: learnable SE(3)+scale residuals.

Functional re-design of the reference's `BoxModel`
(/root/reference/model/boxmodel.py:4-57): the per-(frame, instance) rigid
box-to-world transform comes from dataset annotations; a learnable residual
(delta_r quaternion, delta_s scale, delta_t translation) right-multiplies it:

    adjust_box2world = box2world @ [diag(delta_s) @ R(delta_r) | delta_t]

and an L2 pull toward identity regularizes the deltas each step
(boxmodel.py:44-49). State lives in a pytree; its Adam lives in
vegs_tpu.optim.tensor_adam_*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from . import geometry


@struct.dataclass
class BoxDeltas:
    """Learnable residual per dynamic-object instance-frame. Leaves may carry
    a leading batch dimension for stacked instances."""

    delta_r: jax.Array  # [..., 4] quaternion (w,x,y,z), init (1,0,0,0)
    delta_s: jax.Array  # [..., 3] scales, init 1
    delta_t: jax.Array  # [..., 3] translation, init 0

    @staticmethod
    def identity(batch_shape=()) -> "BoxDeltas":
        r = jnp.zeros(batch_shape + (4,)).at[..., 0].set(1.0)
        return BoxDeltas(
            delta_r=r,
            delta_s=jnp.ones(batch_shape + (3,)),
            delta_t=jnp.zeros(batch_shape + (3,)),
        )


def d_box2world(deltas: BoxDeltas) -> jax.Array:
    """[..., 4, 4] residual transform: diag(s) @ R(q) with translation t."""
    R = geometry.quat_to_rotmat(deltas.delta_r)
    SR = deltas.delta_s[..., :, None] * R  # row-scaling = diag(s) @ R
    top = jnp.concatenate([SR, deltas.delta_t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def adjust_box2world(box2world: jax.Array, deltas: BoxDeltas) -> jax.Array:
    """box2world @ d_box2world (reference boxmodel.py:40-42)."""
    return box2world @ d_box2world(deltas)


def safe_norm(x: jax.Array, axis=-1, eps: float = 1e-12) -> jax.Array:
    """L2 norm with a finite (zero) gradient at ||x|| == 0.

    jnp.linalg.norm's gradient at exactly zero is NaN (0/0). The deltas
    START at exact identity, so a combined photometric+regularizer loss
    hits that point on the very first step — and the reference-parity NaN
    guard (train.py:198-205) then zeroes the WHOLE delta gradient, freezing
    the deltas at identity forever. (The reference never evaluates its
    regularizer at identity: it steps the box optimizer on the photometric
    gradient FIRST and only then runs the separate regularize() backward,
    /root/reference/train.py:274-278 — a one-step ordering quirk our
    single-dispatch step must reproduce via a subgradient instead.)"""
    ss = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(ss, eps * eps))


def regularize_loss(deltas: BoxDeltas) -> jax.Array:
    """L2 pull of residuals toward identity (reference boxmodel.py:44-49);
    summed over any batch dims."""
    e = jnp.zeros_like(deltas.delta_r).at[..., 0].set(1.0)
    return (
        jnp.sum(safe_norm(deltas.delta_r - e))
        + jnp.sum(safe_norm(deltas.delta_s - 1.0))
        + jnp.sum(safe_norm(deltas.delta_t))
    )


def delta_magnitudes(deltas: BoxDeltas):
    """(|dr|, |ds|, |dt|) for logging (reference get_deltas)."""
    e = jnp.zeros_like(deltas.delta_r).at[..., 0].set(1.0)
    return (
        jnp.linalg.norm(deltas.delta_r - e, axis=-1),
        jnp.linalg.norm(deltas.delta_s - 1.0, axis=-1),
        jnp.linalg.norm(deltas.delta_t, axis=-1),
    )
