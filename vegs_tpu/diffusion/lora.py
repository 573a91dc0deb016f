"""LoRA utilities: parameter filtering, save/load, per-segment fine-tuning.

Parity with the reference's LoRA layer placement and trainer
(/root/reference/lora/scripts/train_text_to_image_lora_kitti360.py:454-471,
706-749): rank-4 adapters on every UNet attention projection (q/k/v/out in
self- and cross-attention), trained with the epsilon-prediction MSE on scene
crops while the base weights stay frozen. The Flax module tree puts LoRA
leaves at .../to_{q,k,v,out}/lora_{down,up} (see unet.LoRADense), so training
masks and checkpoints are simple path filters.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


def is_lora_path(path) -> bool:
    return any(getattr(k, "key", str(k)) in ("lora_down", "lora_up")
               for k in path)


def lora_mask(params) -> dict:
    """Pytree of bools: True on LoRA leaves (the trainable set)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_lora_path(path), params)


def split_lora(params):
    """(lora_leaves flat dict, by joined path) for checkpointing."""
    flat = {}

    def visit(path, leaf):
        if is_lora_path(path):
            key = "/".join(getattr(k, "key", str(k)) for k in path)
            flat[key] = np.asarray(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return flat


def save_lora_weights(params, path) -> None:
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(split_lora(params), f)


def load_lora_weights(params, path_or_dir):
    """Overwrite LoRA leaves from a saved file (or dir containing
    lora_weights.pkl)."""
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "lora_weights.pkl")
    with open(path, "rb") as f:
        flat = pickle.load(f)

    def visit(p, leaf):
        if is_lora_path(p):
            key = "/".join(getattr(k, "key", str(k)) for k in p)
            if key in flat:
                return jnp.asarray(flat[key])
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


# ---------------------------------------------------------------------------
# Per-segment LoRA fine-tuning (reference lora trainer, 300 steps/segment)
# ---------------------------------------------------------------------------


def random_square_crops(key, images, crop: int, n: int) -> jax.Array:
    """[B, H, W, 3] -> [n, crop, crop, 3] random square crops (the data prep
    of lora/scripts/preprocess_kitti360_for_lora.py:21-61)."""
    b, h, w, _ = images.shape
    ks = jax.random.split(key, 3)
    bi = jax.random.randint(ks[0], (n,), 0, b)
    # random square side <= min(h, w), resized to crop
    ys = jax.random.randint(ks[1], (n,), 0, max(h - crop, 1))
    xs = jax.random.randint(ks[2], (n,), 0, max(w - crop, 1))

    def one(i):
        return jax.lax.dynamic_slice(
            images[bi[i]], (ys[i], xs[i], 0), (crop, crop, 3))

    return jax.vmap(one)(jnp.arange(n))


def train_lora(
    models,
    images_chw: np.ndarray,       # [B, 3, H, W] scene images in [0, 1]
    *,
    steps: int = 300,
    batch_size: int = 1,
    grad_accum: int = 4,
    lr: float = 1e-4,
    crop: int = 512,
    seed: int = 0,
    log_every: int = 50,
):
    """Fine-tune the LoRA leaves with epsilon-prediction MSE.

    Returns (updated unet_params, losses). Mirrors the reference trainer's
    budget: 300 steps, bs 1 x grad-accum 4, lr 1e-4 (bash_scripts/
    lora_train_kitti360.sh:5-17); cosine decay on the LR.
    """
    import optax

    unet = models.unet
    sched = models.schedule
    params = models.unet_params
    mask = lora_mask(params)

    labels = jax.tree.map(lambda m: "lora" if m else "frozen", mask)
    tx = optax.multi_transform(
        {
            "lora": optax.adamw(optax.cosine_decay_schedule(
                lr, steps * grad_accum)),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    opt_state = tx.init(params)

    images = jnp.asarray(np.asarray(images_chw).transpose(0, 2, 3, 1))
    ctx = models.text_embeddings[0:1]  # prompt embedding

    @jax.jit
    def step(params, opt_state, key):
        k_crop, k_t, k_n, k_enc = jax.random.split(key, 4)
        crops = random_square_crops(k_crop, images, min(crop, images.shape[1],
                                                        images.shape[2]),
                                    batch_size)
        lat = models.vae.apply(
            models.vae_params, crops * 2.0 - 1.0, k_enc, method="encode")
        t = jax.random.randint(k_t, (batch_size,), 0,
                               sched.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape)
        noisy = sched.add_noise(lat, noise, t)

        def loss_fn(p):
            eps = unet.apply(p, noisy, t, jnp.repeat(ctx, batch_size, 0))
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.key(seed)
    losses = []
    for i in range(steps):
        acc = 0.0
        for _ in range(grad_accum):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            acc += float(loss)
        losses.append(acc / grad_accum)
    return params, losses
