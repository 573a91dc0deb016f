"""VGG perceptual loss (feature L1 + optional Gram style loss).

Parity with /root/reference/loss/vgg_perceptual_loss.py:4-44: 4-block VGG16
feature L1 with optional style (Gram) term, inputs resized to 224x224 and
ImageNet-normalized. Unlike the reference — which instantiates it but never
calls it in the loop (SURVEY §2.4) — the trainer here actually applies it when
cfg.sd.perceptual_loss is set.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import vgg


def _resize224(x_chw: jax.Array) -> jax.Array:
    return jax.image.resize(x_chw, (x_chw.shape[0], 224, 224), "bilinear")


def vgg_perceptual_loss(
    params,
    pred_chw: jax.Array,      # [3, H, W] in [0,1]
    target_chw: jax.Array,
    feature_layers: Sequence[int] = (0, 1, 2, 3),
    style_layers: Sequence[int] = (),
) -> jax.Array:
    pred = _resize224(pred_chw)
    target = _resize224(target_chw)
    f_pred = vgg.extract_features(params, pred)
    f_tgt = vgg.extract_features(params, jax.lax.stop_gradient(target))

    loss = jnp.float32(0.0)
    for i in feature_layers:
        loss = loss + jnp.mean(jnp.abs(f_pred[i] - f_tgt[i]))
    for i in style_layers:
        def gram(f):
            b, h, w, c = f.shape
            m = f.reshape(b, h * w, c)
            return jnp.einsum("bnc,bnd->bcd", m, m) / (h * w)
        loss = loss + jnp.mean(jnp.abs(gram(f_pred[i]) - gram(f_tgt[i])))
    return loss
