"""Per-group Adam with the 3DGS learning-rate policy, as a pure pytree.

Replaces the reference's torch.optim.Adam with param groups and in-place
optimizer-state "surgery" (/root/reference/scene/gaussian_model.py:154-180,
263-332): here the state is a pytree mirroring the GaussianField, so
densification recompaction is an ordinary gather over (params, state) —
see vegs_tpu.densify.

Learning rates (reference training_setup, gaussian_model.py:154-172):
  means:   position_lr_init * spatial_scale, exp-decayed to position_lr_final
           * spatial_scale over position_lr_max_steps (log-lerp w/ delay)
  sh_dc:   feature_lr;  sh_rest: feature_lr / 20
  opacity: opacity_lr;  log_scales: scaling_lr;  quats: rotation_lr
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .config import OptimizationParams
from .gaussians import GaussianField


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear interpolated LR with optional delayed cosine ramp
    (reference utils/general_utils.py:48-81)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    out = delay_rate * log_lerp
    # Reference returns 0.0 when step < 0 or lr_init == 0
    return jnp.where(step < 0, 0.0, out)


@struct.dataclass
class AdamState:
    mu: GaussianField      # first moments (same tree structure, valid unused)
    nu: GaussianField      # second moments
    count: jax.Array       # scalar int32


class FieldLRs(NamedTuple):
    means: jax.Array
    quats: jax.Array
    log_scales: jax.Array
    sh_dc: jax.Array
    sh_rest: jax.Array
    opacity_logit: jax.Array


def field_lrs(opt: OptimizationParams, spatial_scale: float, step,
              xyz_lr_mult: float = 1.0) -> FieldLRs:
    """Per-leaf learning rates at `step`. xyz_lr_mult implements the box
    model's box_lr_mult (reference gaussian_model.py:532-551)."""
    xyz = expon_lr(
        step,
        opt.position_lr_init * spatial_scale * xyz_lr_mult,
        opt.position_lr_final * spatial_scale * xyz_lr_mult,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    f = jnp.float32
    return FieldLRs(
        means=xyz,
        quats=f(opt.rotation_lr),
        log_scales=f(opt.scaling_lr),
        sh_dc=f(opt.feature_lr),
        sh_rest=f(opt.feature_lr / 20.0),
        opacity_logit=f(opt.opacity_lr),
    )


PARAM_LEAVES = ("means", "quats", "log_scales", "sh_dc", "sh_rest", "opacity_logit")


def split_params(field: GaussianField) -> dict:
    """Differentiable view of the field: just the six float parameter leaves
    (GaussianField.valid is bool and must not reach jax.grad)."""
    return {k: getattr(field, k) for k in PARAM_LEAVES}


def with_params(field: GaussianField, params: dict) -> GaussianField:
    return field.replace(**params)


def _zeros_like_params(field: GaussianField) -> GaussianField:
    return field.replace(
        **{k: jnp.zeros_like(getattr(field, k)) for k in PARAM_LEAVES}
    )


def adam_init(field: GaussianField) -> AdamState:
    z = _zeros_like_params(field)
    return AdamState(mu=z, nu=z, count=jnp.int32(0))


def adam_step(
    field: GaussianField,
    grads: GaussianField,
    state: AdamState,
    lrs: FieldLRs,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[GaussianField, AdamState]:
    """One Adam update on the six parameter leaves (eps matches the
    reference's Adam eps=1e-15, gaussian_model.py:172)."""
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for name, lr in zip(PARAM_LEAVES, lrs):
        p = getattr(field, name)
        g = grads[name] if isinstance(grads, dict) else getattr(grads, name)
        # count may be stacked over leading axes (box-slot stacks): align
        # the bias corrections to the leaf's LEADING dims.
        cc1 = jnp.reshape(c1, c1.shape + (1,) * (g.ndim - c1.ndim))
        cc2 = jnp.reshape(c2, c2.shape + (1,) * (g.ndim - c2.ndim))
        m = b1 * getattr(state.mu, name) + (1 - b1) * g
        v = b2 * getattr(state.nu, name) + (1 - b2) * (g * g)
        update = lr * (m / cc1) / (jnp.sqrt(v / cc2) + eps)
        new_params[name] = p - update
        new_mu[name] = m
        new_nu[name] = v

    return (
        field.replace(**new_params),
        AdamState(
            mu=state.mu.replace(**new_mu),
            nu=state.nu.replace(**new_nu),
            count=count,
        ),
    )


# ---------------------------------------------------------------------------
# Generic single-tensor Adam (for BoxModel deltas and other small params)
# ---------------------------------------------------------------------------


@struct.dataclass
class TensorAdamState:
    mu: jax.Array
    nu: jax.Array
    count: jax.Array


def tensor_adam_init(params) -> TensorAdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return TensorAdamState(mu=z, nu=z, count=jnp.int32(0))


def tensor_adam_step(params, grads, state: TensorAdamState, lr,
                     b1=0.9, b2=0.999, eps=1e-8):
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(p, g, m, v):
        # count may be stacked over leading axes (e.g. [n_slots]); align it
        # to the leaf's leading dims, not its trailing ones.
        cc1 = jnp.reshape(c1, c1.shape + (1,) * (g.ndim - c1.ndim))
        cc2 = jnp.reshape(c2, c2.shape + (1,) * (g.ndim - c2.ndim))
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        return p - lr * (m2 / cc1) / (jnp.sqrt(v2 / cc2) + eps), m2, v2

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu)
    # unzip the 3-tuples
    p2 = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
    m2 = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
    v2 = jax.tree.map(lambda t: t[2], flat, is_leaf=lambda t: isinstance(t, tuple))
    return p2, TensorAdamState(mu=m2, nu=v2, count=count)
