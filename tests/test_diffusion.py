"""Diffusion stack: schedule math, UNet/VAE shapes, LoRA, guidance losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vegs_tpu.diffusion import DiffusionSchedule, UNetConfig, VAEConfig
from vegs_tpu.diffusion.pipeline import DiffusionModels, cfg_noise_pred, encode_image
from vegs_tpu.diffusion import lora as lora_mod
from vegs_tpu.losses.sd_guidance import SDGuidance


@pytest.fixture(scope="module")
def tiny_models():
    return DiffusionModels.tiny(jax.random.key(0), image_size=32, lora_rank=4)


def test_schedule_math():
    s = DiffusionSchedule.scaled_linear(1000)
    a = np.asarray(s.alphas_cumprod)
    assert a.shape == (1000,)
    assert np.all(np.diff(a) < 0) and 0 < a[-1] < a[0] < 1
    x0 = jnp.ones((1, 4, 4, 2))
    noise = jnp.zeros_like(x0)
    x_t = s.add_noise(x0, noise, jnp.array([10]))
    np.testing.assert_allclose(
        np.asarray(x_t), np.sqrt(a[10]), rtol=1e-5)
    # t=0 keeps nearly everything
    assert float(s.sigma(jnp.array([0]))[0]) < 0.05
    # DDIM step with exact noise recovers x0 at t_prev = -1
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    x_t = s.add_noise(x0, eps, jnp.array([500]))
    x0_rec = s.ddim_step(x_t, eps, 500, -1)
    np.testing.assert_allclose(np.asarray(x0_rec), 1.0, atol=1e-4)


def test_unet_shapes_and_grads(tiny_models):
    m = tiny_models
    lat = jax.random.normal(jax.random.key(2), (2, 8, 8, 4))
    t = jnp.array([3, 700])
    ctx = jnp.repeat(m.text_embeddings[:1], 2, axis=0)
    out = m.unet.apply(m.unet_params, lat, t, ctx)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_vae_roundtrip_shapes(tiny_models):
    m = tiny_models
    img = jax.random.uniform(jax.random.key(3), (1, 32, 32, 3))
    z = m.vae.apply(m.vae_params, img * 2 - 1, None, method="encode")
    assert z.shape == (1, 16, 16, 4)
    rec = m.vae.apply(m.vae_params, z, method="decode")
    assert rec.shape == img.shape


def test_lora_mask_and_roundtrip(tmp_path, tiny_models):
    m = tiny_models
    mask = lora_mod.lora_mask(m.unet_params)
    n_lora = sum(jax.tree.leaves(jax.tree.map(int, mask)))
    assert n_lora > 0
    flat = lora_mod.split_lora(m.unet_params)
    assert len(flat) == n_lora
    # zero-init up-projections => LoRA is initially a no-op
    ups = [v for k, v in flat.items() if "lora_up" in k]
    assert all((u == 0).all() for u in ups)

    p = tmp_path / "lora_weights.pkl"
    lora_mod.save_lora_weights(m.unet_params, p)
    # perturb then restore
    perturbed = jax.tree.map(lambda x: x + 1.0, m.unet_params)
    restored = lora_mod.load_lora_weights(perturbed, str(tmp_path))
    flat2 = lora_mod.split_lora(restored)
    for k in flat:
        np.testing.assert_allclose(flat2[k], flat[k])


def test_cfg_noise_pred_orientations(tiny_models):
    m = tiny_models
    lat = jax.random.normal(jax.random.key(4), (1, 8, 8, 4))
    t = jnp.array([100])
    e_ref = cfg_noise_pred(m, lat, t, 7.5, reference_cfg_orientation=True)
    e_std = cfg_noise_pred(m, lat, t, 7.5, reference_cfg_orientation=False)
    assert e_ref.shape == lat.shape
    # different orientations must differ (unless embeddings coincide)
    assert not np.allclose(np.asarray(e_ref), np.asarray(e_std))
    # scale=1.0 makes both orientations agree on eps_prompt vs eps_neg mix
    e1a = cfg_noise_pred(m, lat, t, 1.0, True)
    e1b = cfg_noise_pred(m, lat, t, 1.0, False)
    assert not np.allclose(np.asarray(e1a), np.asarray(e1b))


def test_guidance_losses(tiny_models):
    g_sm = SDGuidance(tiny_models, guidance_mode="score-matching",
                      start_iter=0, max_iters=100, max_step=50)
    g_sds = SDGuidance(tiny_models, guidance_mode="sds",
                       start_iter=0, max_iters=100, max_step=50)
    rgb = jax.random.uniform(jax.random.key(5), (3, 32, 32))

    for g in (g_sm, g_sds):
        loss, grad = jax.value_and_grad(
            lambda x: g(jax.random.key(6), x, 10))(rgb)
        assert np.isfinite(float(loss))
        gnp = np.asarray(grad)
        assert np.isfinite(gnp).all()
        assert np.abs(gnp).sum() > 0  # guidance reaches the rendering

    # annealing: max_step decreases over the window
    assert int(g_sm.max_step_at(0)) == 50
    assert int(g_sm.max_step_at(50)) == 25
    assert int(g_sm.max_step_at(100)) == 0


def test_lora_training_reduces_loss(tiny_models):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    params, losses = lora_mod.train_lora(
        tiny_models, imgs, steps=6, batch_size=2, grad_accum=1, lr=2e-3,
        crop=16)
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    # LoRA up-projections moved away from zero
    flat = lora_mod.split_lora(params)
    moved = max(np.abs(v).max() for k, v in flat.items() if "lora_up" in k)
    assert moved > 0
