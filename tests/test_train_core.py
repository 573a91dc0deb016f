"""Optimizer, densification, losses, Gaussian field plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from vegs_tpu import densify, gaussians, optim
from vegs_tpu.config import OptimizationParams
from vegs_tpu.losses import l1_loss, psnr, ssim
from vegs_tpu.losses.photometric import l2_loss


def _small_field(rng, n=64, cap=128):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return gaussians.create_from_points(pts, cols, capacity=cap)


def test_create_from_points(rng):
    f = _small_field(rng)
    assert f.capacity == 128
    assert int(f.num_active()) == 64
    ops = np.asarray(f.opacities())
    np.testing.assert_allclose(ops[:64, 0], 0.1, atol=1e-5)
    np.testing.assert_allclose(ops[64:], 0.0)  # dead slots contribute nothing
    s = np.asarray(f.scales())
    # scale_clip clamps the SQUARED knn distance (reference semantics), so
    # the scale ceiling is sqrt(0.2).
    assert (s[:64] > 0).all() and (s[:64] <= np.sqrt(0.2) + 1e-6).all()


def test_create_from_points_box_clip_not_degenerate(rng):
    """Box-field clip (1e-7, 1e-4) must produce a RANGE of scales
    [sqrt(1e-7), sqrt(1e-4)], not pin every Gaussian to one value
    (ADVICE.md round-1 medium finding)."""
    pts = rng.normal(size=(64, 3)).astype(np.float32) * 0.02
    f = gaussians.create_from_points(pts, capacity=64, scale_clip=(1e-7, 1e-4))
    s = np.asarray(f.scales())
    assert s.min() >= np.sqrt(1e-7) - 1e-9
    assert s.max() <= np.sqrt(1e-4) + 1e-9
    assert np.unique(np.round(s, 8)).size > 1


def test_sh_band_mask():
    m = np.asarray(gaussians.sh_band_mask(0))
    assert m.tolist() == [1] + [0] * 15
    m2 = np.asarray(gaussians.sh_band_mask(2))
    assert m2.sum() == 9


def test_expon_lr_schedule():
    lr0 = float(optim.expon_lr(0, 1e-3, 1e-5, max_steps=1000))
    lr_mid = float(optim.expon_lr(500, 1e-3, 1e-5, max_steps=1000))
    lr_end = float(optim.expon_lr(1000, 1e-3, 1e-5, max_steps=1000))
    np.testing.assert_allclose(lr0, 1e-3, rtol=1e-5)
    np.testing.assert_allclose(lr_mid, 1e-4, rtol=1e-4)  # log-lerp midpoint
    np.testing.assert_allclose(lr_end, 1e-5, rtol=1e-5)


def test_adam_descends(rng):
    f = _small_field(rng)
    state = optim.adam_init(f)
    target = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    opt_cfg = OptimizationParams()

    def loss_fn(params):
        field = optim.with_params(f, params)
        return jnp.sum(jnp.where(field.valid[:, None], (field.means - target) ** 2, 0.0))

    l0 = float(loss_fn(optim.split_params(f)))
    for step in range(50):
        grads = jax.grad(loss_fn)(optim.split_params(f))
        lrs = optim.field_lrs(opt_cfg, spatial_scale=1.0, step=step)
        lrs = lrs._replace(means=jnp.float32(0.05))
        f, state = optim.adam_step(f, grads, state, lrs)
    assert float(loss_fn(optim.split_params(f))) < 0.5 * l0


def test_densify_clone_and_split(rng):
    f = _small_field(rng, n=64, cap=128)
    state = optim.adam_init(f)
    stats = gaussians.DensifyStats.zeros(128)
    # Mark the first 8 as high-gradient; give 4 of them large scales -> split.
    accum = np.zeros(128, np.float32)
    accum[:8] = 1.0
    denom = np.ones(128, np.float32)
    stats = stats.replace(
        xyz_gradient_accum=jnp.asarray(accum), denom=jnp.asarray(denom)
    )
    big = np.array(f.log_scales)
    big[:4] = np.log(0.5)  # large vs percent_dense * extent
    f = f.replace(log_scales=jnp.asarray(big))

    f2, s2, st2, n2 = densify.densify_and_prune(
        f, state, stats, jax.random.key(0),
        grad_threshold=0.5, percent_dense=0.01, extent=1.0,
    )
    # 64 - 4 split parents + 4 clones + 8 split children = 72
    assert n2 == 72
    assert int(f2.num_active()) == 72
    assert np.asarray(st2.denom).sum() == 0  # stats reset
    # split parents (scale 0.5) are gone; their children shrank by /1.6
    s_new = np.asarray(f2.scales())[np.asarray(f2.valid)]
    assert s_new.max() < 0.5 - 1e-3
    assert np.isclose(s_new, 0.5 / 1.6, atol=1e-4).any()


def test_densify_prune_low_opacity(rng):
    f = _small_field(rng, n=64, cap=128)
    logits = np.array(f.opacity_logit)
    logits[:10] = -10.0  # opacity ~ 4.5e-5 < 0.005
    f = f.replace(opacity_logit=jnp.asarray(logits))
    state = optim.adam_init(f)
    stats = gaussians.DensifyStats.zeros(128)
    f2, _, _, n2 = densify.densify_and_prune(
        f, state, stats, jax.random.key(0),
        grad_threshold=1e9, percent_dense=0.01, extent=1.0,
    )
    assert n2 == 54


def test_adam_state_carried_through_recompaction(rng):
    f = _small_field(rng, n=16, cap=32)
    state = optim.adam_init(f)
    # fake some moments
    state = optim.AdamState(
        mu=state.mu.replace(means=jnp.ones_like(state.mu.means)),
        nu=state.nu.replace(means=jnp.ones_like(state.nu.means) * 2),
        count=jnp.int32(5),
    )
    stats = gaussians.DensifyStats.zeros(32)
    f2, s2, _, n2 = densify.densify_and_prune(
        f, state, stats, jax.random.key(0),
        grad_threshold=1e9, percent_dense=0.01, extent=1.0,
    )
    assert n2 == 16
    mu = np.asarray(s2.mu.means)
    assert (mu[:16] == 1.0).all() and (mu[16:] == 0.0).all()
    assert int(s2.count) == 5


def test_reset_opacity(rng):
    f = _small_field(rng)
    state = optim.adam_init(f)
    f2, s2 = densify.reset_opacity(f, state)
    ops = np.asarray(f2.opacities())[np.asarray(f2.valid)]
    assert ops.max() <= 0.01 + 1e-5


def test_ssim_and_psnr(rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 48)).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(psnr(img, img)) > 60
    noisy = img + 0.1 * jnp.asarray(rng.normal(size=(3, 32, 48)).astype(np.float32))
    assert float(ssim(img, noisy)) < 0.95
    assert 15 < float(psnr(img, jnp.clip(noisy, 0, 1))) < 30
    assert float(l1_loss(img, img)) == 0
    m = jnp.zeros((32, 48)).at[:16].set(1.0)
    masked = float(l1_loss(img, noisy, mask=m[None]))
    assert masked > 0


def test_normal_guidance_flat_alignment(rng):
    from vegs_tpu.losses import loss_normal_guidance

    h, w = 8, 8
    # Identity rotation, flat (1e-5) first axis. The scale term penalizes a
    # normal along a LARGE axis and is ~0 along the flat axis (the rotation
    # term alone is axis-permutation invariant).
    q = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    quat_map = jnp.broadcast_to(jnp.asarray(q)[:, None, None], (4, h, w))
    scale_map = jnp.broadcast_to(
        jnp.asarray([1e-5, 0.1, 0.1], jnp.float32)[:, None, None], (3, h, w)
    )
    n_flat = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32)[:, None, None], (3, h, w)
    )
    n_big = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32)[:, None, None], (3, h, w)
    )
    aligned = float(loss_normal_guidance(quat_map, scale_map, n_flat))
    misaligned = float(loss_normal_guidance(quat_map, scale_map, n_big))
    assert aligned < misaligned
    # gradients flow into quats and scales
    g = jax.grad(
        lambda qm, sm: loss_normal_guidance(qm, sm, n_big), argnums=(0, 1)
    )(quat_map, scale_map)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert float(jnp.abs(g[1]).sum()) > 0


def test_l2_and_grads(rng):
    a = jnp.asarray(rng.normal(size=(3, 8, 8)).astype(np.float32))
    b = jnp.zeros((3, 8, 8))
    g = jax.grad(lambda x: l2_loss(x, b))(a)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(a) / a.size, atol=1e-6)
    g2 = jax.grad(lambda x: ssim(x, b))(a)
    assert np.isfinite(np.asarray(g2)).all()


def test_adapt_k_cap_grows_and_decays():
    """Round-3 VERDICT item 7: a transient dense frame doubles k_cap, and
    sustained <25% utilization halves it back (running-max guarded)."""
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.train import Trainer

    tr = Trainer.__new__(Trainer)          # decay logic only; no scene
    tr.raster_cfg = RasterizeConfig(k_cap=1 << 17)
    tr._guidance_fn = tr._percep_fn = None

    # overflow -> grow 2x
    tr._adapt_k_cap(num_dropped=10.0, num_needed=float(1 << 17))
    assert tr.raster_cfg.k_cap == 1 << 18

    # sustained low utilization -> shrink 2x after the window
    for _ in range(Trainer.K_CAP_DECAY_WINDOW):
        assert tr.raster_cfg.k_cap == 1 << 18
        tr._adapt_k_cap(num_dropped=0.0, num_needed=1000.0)
    assert tr.raster_cfg.k_cap == 1 << 17

    # a single busy frame inside the window resets the streak
    for _ in range(Trainer.K_CAP_DECAY_WINDOW - 1):
        tr._adapt_k_cap(num_dropped=0.0, num_needed=1000.0)
    tr._adapt_k_cap(num_dropped=0.0, num_needed=float(1 << 16))  # >25%
    for _ in range(Trainer.K_CAP_DECAY_WINDOW - 1):
        tr._adapt_k_cap(num_dropped=0.0, num_needed=1000.0)
    assert tr.raster_cfg.k_cap == 1 << 17  # streak was reset, no shrink yet
    tr._adapt_k_cap(num_dropped=0.0, num_needed=1000.0)
    assert tr.raster_cfg.k_cap == 1 << 16

    # never below the floor
    tr.raster_cfg = RasterizeConfig(k_cap=Trainer.K_CAP_MIN)
    for _ in range(Trainer.K_CAP_DECAY_WINDOW + 1):
        tr._adapt_k_cap(num_dropped=0.0, num_needed=100.0)
    assert tr.raster_cfg.k_cap == Trainer.K_CAP_MIN


def test_box_deltas_unfreeze_from_identity(rng):
    """Regression (round-4): at the EXACT identity init, jnp.linalg.norm's
    NaN gradient in the delta regularizer used to poison the whole delta
    gradient through the NaN guard, freezing the deltas at identity for the
    entire run (QUALITY_FULL_r03's box-err never moved). With
    boxmodel.safe_norm, the first step from identity must already move
    delta_t toward the photometric signal."""
    from vegs_tpu.boxmodel import BoxDeltas, safe_norm
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.train import BoxSlotState, TrainState, make_train_step

    # safe_norm: finite zero-gradient at 0, exact elsewhere
    g0 = jax.grad(lambda x: safe_norm(x))(jnp.zeros(3))
    assert np.isfinite(np.asarray(g0)).all() and float(jnp.sum(g0 ** 2)) == 0
    gx = jax.grad(lambda x: safe_norm(x))(jnp.array([0.3, 0.0, 0.4]))
    np.testing.assert_allclose(np.asarray(gx), [0.6, 0.0, 0.8], rtol=1e-6)

    h, w = 32, 64
    prng = np.random.default_rng(5)
    field = gaussians.create_from_points(
        prng.normal(size=(64, 3)).astype(np.float32) * 2.0,
        prng.uniform(0, 1, (64, 3)).astype(np.float32), capacity=128)
    bpts = prng.uniform(-0.45, 0.45, (40, 3)).astype(np.float32)
    bcols = prng.uniform(0.5, 1.0, (40, 3)).astype(np.float32)
    bfield = gaussians.create_from_points(bpts, bcols, capacity=64)
    bfields = jax.tree.map(lambda x: x[None], bfield)
    box_state = BoxSlotState(
        fields=bfields,
        opt=jax.tree.map(lambda x: x[None], optim.adam_init(bfield)),
        stats=jax.tree.map(lambda x: x[None], densify.DensifyStats.zeros(64))
        if hasattr(densify, "DensifyStats") else
        jax.tree.map(lambda x: x[None], gaussians.DensifyStats.zeros(64)))
    from utils import make_camera
    cam = make_camera(height=h, width=w, t=np.array([0, 0, 4.0]))
    b2w = jnp.eye(4)[None].at[0, 2, 3].set(2.5)
    deltas = jax.tree.map(lambda x: x[None], BoxDeltas.identity())
    delta_opt = optim.tensor_adam_init(dict(
        delta_r=deltas.delta_r, delta_s=deltas.delta_s,
        delta_t=deltas.delta_t))

    raster = RasterizeConfig(backend="dense", k_cap=1 << 12)
    step = make_train_step(OptimizationParams(), raster, spatial_scale=4.0,
                           n_box_slots=1, use_normal_loss=False,
                           box_lr_mult=1.0, boxmodel_lr=5e-3,
                           boxmodel_lambda_reg=1e-3)
    st = TrainState(field=field, opt=optim.adam_init(field),
                    stats=gaussians.DensifyStats.zeros(field.capacity),
                    step=jnp.int32(0))
    gt = jnp.zeros((3, h, w))  # any photometric mismatch will do
    st2, bs2, dl2, do2, met = step(
        st, box_state, jax.tree.map(jnp.asarray, deltas), delta_opt, b2w,
        jnp.ones((1,), bool), cam, gt, jnp.zeros((3, h, w)),
        jnp.float32(0.0), jnp.int32(3), jnp.zeros(3))
    assert np.isfinite(float(met["loss"]))
    dt = np.asarray(dl2.delta_t)
    dr = np.asarray(dl2.delta_r)
    assert np.isfinite(dt).all() and np.isfinite(dr).all()
    # THE regression: deltas must have moved off exact identity in step 1
    assert np.abs(dt).max() > 0, "delta_t frozen at identity"
