"""Multi-device sharding: DP train step on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vegs_tpu import gaussians, optim
from vegs_tpu.config import OptimizationParams
from vegs_tpu.gaussians import DensifyStats
from vegs_tpu.ops.rasterize import RasterizeConfig
from vegs_tpu.parallel import make_dp_train_step, make_mesh
from vegs_tpu.parallel.sharded_step import stack_camera_batch

from utils import make_camera


def _setup(rng, n_devices, h=32, w=128):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=256)
    cams = []
    for i in range(n_devices):
        th = 2 * np.pi * i / n_devices
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        cams.append(make_camera(height=h, width=w, R=R, t=np.array([0, 0, 4.0])))
    return field, cams, h, w


def test_dp_step_runs_and_matches_single_device(rng):
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual devices"
    field, cams, h, w = _setup(rng, 8)
    opt_state = optim.adam_init(field)
    stats = DensifyStats.zeros(field.capacity)
    mesh = make_mesh(8)
    raster = RasterizeConfig(backend="dense", k_cap=1 << 12)

    step = make_dp_train_step(mesh, OptimizationParams(), raster,
                              spatial_scale=4.0, height=h, width=w)
    cam_batch = stack_camera_batch(cams)
    gt = jnp.zeros((8, 3, h, w))
    normal = jnp.zeros((8, 3, h, w))
    f2, o2, s2, step2, metrics = step(field, opt_state, stats, jnp.int32(0),
                                      cam_batch, gt, normal, jnp.int32(3),
                                      jnp.zeros(3))
    assert int(step2) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    assert float(jnp.abs(f2.sh_dc - field.sh_dc).sum()) > 0

    # single-device reference: mean of per-camera grads == psum/nd result
    def loss_one(params, cam):
        from vegs_tpu.render import field_arrays, _run
        from vegs_tpu.losses import l1_loss, ssim

        fl = optim.with_params(field, params)
        arrays = field_arrays(fl, 3)
        out = _run(cam, arrays, bg=jnp.zeros(3), scale_modifier=1.0,
                   override_color=None, sh_degree=3, config=raster,
                   means2d_offset=None)
        o = OptimizationParams()
        return ((1 - o.lambda_dssim) * l1_loss(out.rgb, jnp.zeros((3, h, w)))
                + o.lambda_dssim * (1 - ssim(out.rgb, jnp.zeros((3, h, w)))))

    params = optim.split_params(field)
    grads = [jax.grad(loss_one)(params, c) for c in cams]
    mean_grad = jax.tree.map(lambda *g: sum(g) / len(g), *grads)
    lrs = optim.field_lrs(OptimizationParams(), 4.0, jnp.int32(0))
    f_ref, _ = optim.adam_step(field, mean_grad, opt_state, lrs)
    np.testing.assert_allclose(
        np.asarray(f2.sh_dc), np.asarray(f_ref.sh_dc), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(f2.means), np.asarray(f_ref.means), atol=2e-6)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dp_full_trainer_with_boxes(tmp_path, rng):
    """The REAL trainer (box slots, normal loss path, densify stats) running
    data-parallel on the mesh: metrics finite, params move, the right
    frames' box deltas advance."""
    import test_training as tt
    from vegs_tpu.train import Trainer

    info = tt._toy_scene_info(rng, with_box=True)
    from vegs_tpu.config import VegsConfig
    from vegs_tpu.scene import Scene
    from vegs_tpu.train import eval_render

    cfg = VegsConfig()
    cfg.model.model_path = str(tmp_path / "model")
    cfg.opt.densify_from_iter = 2
    cfg.opt.densification_interval = 4
    cfg.opt.densify_until_iter = 100
    cfg.opt.opacity_reset_interval = 10_000
    scene = Scene(cfg.model, scene_info=info, shuffle=False)
    tr = Trainer(cfg, scene, raster_cfg=tt.RASTER, dp_devices=2)
    for cam in scene.train_cameras + scene.test_cameras:
        out = eval_render(tr.state.field, cam.device_params(), tr.bg, 3,
                          tt.RASTER)
        cam.image = np.clip(np.asarray(out.rgb), 0, 1)

    sh0 = np.asarray(tr.state.field.sh_dc).copy()
    box0 = np.asarray(tr.box_fields[26001].means).copy()
    ms = [tr.train_iteration(it) for it in range(1, 6)]
    assert all(np.isfinite(m["loss"]) for m in ms)
    assert np.abs(np.asarray(tr.state.field.sh_dc) - sh0).sum() > 0
    # the box field and this frame's deltas advanced
    assert np.abs(np.asarray(tr.box_fields[26001].means) - box0).sum() > 0
    assert (0, 26001) in tr.frame_deltas
    d = tr.frame_deltas[(0, 26001)]
    assert np.isfinite(np.asarray(d.delta_t)).all()
    # densify stats accumulated per view: denom counts 2 cameras per step
    # for Gaussians seen by both
    assert float(np.asarray(tr.state.stats.denom).max()) >= 2.0
    # explicit-camera API keeps working under DP (camera replicated across
    # the batch; psum/D of identical grads == the single-camera gradient)
    m = tr.train_iteration(6, camera=scene.train_cameras[0])
    assert np.isfinite(m["loss"])


def test_dp_densify_stats_match_sequential(rng):
    """D-camera DP step must accumulate EXACTLY the per-view densify stats
    of D sequential single-view steps taken from the same state (the
    round-1 psum/pmax semantics drift, now fixed)."""
    from vegs_tpu.config import OptimizationParams
    from vegs_tpu.train import TrainState, make_train_step
    from vegs_tpu.parallel.sharded_step import stack_camera_batch

    D = 4
    field, cams, h, w = _setup(rng, D)
    raster = RasterizeConfig(backend="dense", k_cap=1 << 12)
    state0 = TrainState(field=field, opt=optim.adam_init(field),
                        stats=DensifyStats.zeros(field.capacity),
                        step=jnp.int32(0))
    kw = dict(opt_cfg=OptimizationParams(), raster_cfg=raster,
              spatial_scale=4.0, use_normal_loss=False, n_box_slots=0,
              box_lr_mult=1.0, boxmodel_lr=1e-3, boxmodel_lambda_reg=1e-3)
    single = make_train_step(**kw)
    gt1 = jnp.zeros((3, h, w))
    nrm1 = jnp.zeros((3, h, w))
    seq_stats = []
    for c in cams:
        st, *_ = single(state0, None, None, None, jnp.zeros((0, 4, 4)),
                        jnp.zeros((0,), bool), c, gt1, nrm1,
                        jnp.float32(0.0), jnp.int32(3), jnp.zeros(3))
        seq_stats.append(st.stats)
    want_accum = sum(np.asarray(s.xyz_gradient_accum) for s in seq_stats)
    want_denom = sum(np.asarray(s.denom) for s in seq_stats)
    want_radii = np.max([np.asarray(s.max_radii2d) for s in seq_stats], axis=0)

    mesh = make_mesh(D)
    dp = make_train_step(**kw, mesh=mesh)
    cam_batch = stack_camera_batch(cams)
    st_dp, *_ = dp(state0, None, None, None, jnp.zeros((D, 0, 4, 4)),
                   jnp.zeros((D, 0), bool), cam_batch,
                   jnp.zeros((D, 3, h, w)), jnp.zeros((D, 3, h, w)),
                   jnp.zeros((D,), jnp.float32), jnp.int32(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(st_dp.stats.xyz_gradient_accum),
                               want_accum, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_dp.stats.denom), want_denom,
                               atol=0)
    np.testing.assert_allclose(np.asarray(st_dp.stats.max_radii2d),
                               want_radii, atol=0)


def test_gauss_axis_sharded_rasterize_bit_identical(rng):
    """Gaussian-axis sharding (SURVEY §2.5 TP slice): project + payload on
    N/D rows per device, all_gather the compact rows, replicated bin+blend
    — images must match the single-device pipeline to float32 round-off
    (bitwise equality is prevented only by per-compilation FMA
    reassociation in the projection elementwise chain), and gradients must
    flow back to the sharded parameters.

    Shapes sized for CI (round-2 verdict item 6): equivalence holds at any
    scale, so the smallest grid that still exercises multi-tile multi-shard
    paths (32x64 = 2x4 tiles, 8 shards, ~5k instances) keeps this test
    under ~1.5 min on the 4-core CPU host (was 332 s at 48x96/2048)."""
    from vegs_tpu import geometry
    from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from vegs_tpu.parallel.gauss_sharded import (
        make_gauss_mesh, make_gauss_sharded_rasterize, shard_field_arrays,
        sharded_state_bytes)
    from utils import make_camera, random_gaussians

    n, D = 1024, 8
    h, w = 32, 64
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, n)
    valid = jnp.ones((n,), bool)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cfg = RasterizeConfig(backend="dense", k_cap=1 << 13)

    ref = rasterize(means, quats, scales, opac, shs, cam, bg=bg, config=cfg)

    mesh = make_gauss_mesh(D)
    fn = make_gauss_sharded_rasterize(mesh, cam, cfg)
    sharded = shard_field_arrays(mesh, means, quats, scales, opac, shs, valid)
    rgb, depth, alpha = fn(*sharded, bg)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=2e-6)

    # gradients flow to the sharded parameters (all_gather transposes to
    # a reduce_scatter back onto each device's own rows)
    def loss(m):
        r, _, _ = fn(m, *sharded[1:], bg)
        return jnp.mean(r ** 2)

    g = jax.grad(loss)(sharded[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    # memory story: sharded state is a real reduction at scale
    from vegs_tpu import gaussians as glib
    f = glib.create_from_points(
        np.asarray(rng.normal(size=(1024, 3)), np.float32), capacity=1 << 20)
    mem = sharded_state_bytes(f, 8)
    assert mem["ratio"] > 4.0


def test_tile_axis_sharded_rasterize_matches_single_device(rng):
    """Tile-axis sharding with all-to-all splat exchange (SURVEY §2.5 SP
    row): each device projects/bins its Gaussian shard, one all_to_all
    delivers every splat to the device owning its tile rows, each device
    blends only its rows. Depth-tie ordering matches the single-device
    layout exactly (stable merge of pre-sorted runs), so images agree to
    f32 round-off; gradients must match the single-device pipeline too.

    CI-sized like the gauss-axis test above (verdict item 6): the plan
    pads nty up to the 8-device mesh either way (2->8 rows here, 3->8 at
    the old 48x96), so the shard geometry and all_to_all exchange are
    exercised identically; was 300 s at 48x96/2048."""
    from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from vegs_tpu.parallel.gauss_sharded import shard_field_arrays
    from vegs_tpu.parallel.tile_sharded import (
        make_tile_mesh, make_tile_sharded_rasterize)
    from utils import make_camera, random_gaussians

    n, D = 1024, 8
    h, w = 32, 64
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, n)
    valid = jnp.ones((n,), bool)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cfg = RasterizeConfig(backend="dense", k_cap=1 << 13)

    ref = rasterize(means, quats, scales, opac, shs, cam, bg=bg, config=cfg)
    assert int(ref.num_dropped) == 0

    mesh = make_tile_mesh(D)
    fn = make_tile_sharded_rasterize(mesh, cam, cfg)
    sharded = shard_field_arrays(mesh, means, quats, scales, opac, shs, valid)
    rgb, depth, alpha, dropped = fn(*sharded, bg)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref.rgb),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha),
                               atol=2e-6)

    # gradient equivalence with the single-device pipeline
    def loss_sharded(m):
        r, _, _, _ = fn(m, *sharded[1:], bg)
        return jnp.mean(r ** 2)

    def loss_ref(m):
        out = rasterize(m, quats, scales, opac, shs, cam, bg=bg, config=cfg)
        return jnp.mean(out.rgb ** 2)

    g_sh = jax.grad(loss_sharded)(sharded[0])
    g_ref = jax.grad(loss_ref)(means)
    # grads accumulate in a different (but deterministic) order through the
    # exchange, so allow f32 round-off headroom beyond the image tolerance
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_tile_sharded_exchange_cap_reports_drops(rng):
    """A too-small exchange bucket must DROP (and report) instead of
    silently corrupting the image."""
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.parallel.gauss_sharded import shard_field_arrays
    from vegs_tpu.parallel.tile_sharded import (
        make_tile_mesh, make_tile_sharded_rasterize)
    from utils import make_camera, random_gaussians

    n, D = 2048, 8
    cam = make_camera(height=48, width=96)
    means, quats, scales, opac, shs = random_gaussians(rng, n)
    valid = jnp.ones((n,), bool)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(backend="dense", k_cap=1 << 14)
    mesh = make_tile_mesh(D)
    fn = make_tile_sharded_rasterize(mesh, cam, cfg, k_exch=8)
    rgb, _, _, dropped = fn(
        *shard_field_arrays(mesh, means, quats, scales, opac, shs, valid), bg)
    assert int(dropped) > 0
    assert np.isfinite(np.asarray(rgb)).all()


def test_tp_step_matches_single_device(rng):
    """Fully sharded training step (field/Adam/stats on the shard axis,
    tile-sharded render, no grad collective) must produce the same updated
    parameters and densify stats as the single-device step (DP step on a
    1-device mesh has exactly the sequential trainer's semantics)."""
    from vegs_tpu.parallel.tp_trainer import (
        make_tp_train_step, shard_train_state)
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from utils import make_camera

    h, w = 48, 96
    prng = np.random.default_rng(7)
    pts = prng.normal(size=(300, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (300, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=512)
    cam = make_camera(height=h, width=w, t=np.array([0, 0, 4.0]))
    gt = jnp.asarray(prng.uniform(0, 1, (3, h, w)), jnp.float32)
    normal = jnp.asarray(prng.normal(size=(3, h, w)), jnp.float32)
    normal = normal / jnp.linalg.norm(normal, axis=0, keepdims=True)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    opt_cfg = OptimizationParams()
    raster = RasterizeConfig(backend="dense", k_cap=1 << 13,
                             payload_dtype="f32")

    # Single-device baseline: DP step on a 1-device mesh (== sequential
    # trainer semantics; equivalence asserted by the DP test above).
    opt_state = optim.adam_init(field)
    stats = DensifyStats.zeros(field.capacity)
    base = make_dp_train_step(make_mesh(1), opt_cfg, raster,
                              spatial_scale=4.0, height=h, width=w,
                              use_normal_loss=True)
    cam_batch = stack_camera_batch([cam])
    bf, bo, bs, bstep, bmet = base(
        field, opt_state, stats, jnp.int32(0), cam_batch, gt[None],
        normal[None], jnp.int32(3), bg)

    # Fully sharded step on the 8-device mesh.
    mesh = make_tile_mesh(8)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    tp = make_tp_train_step(mesh, opt_cfg, raster, spatial_scale=4.0,
                            cam=cam, use_normal_loss=True)
    nf, no, ns, nstep, met = tp(sf, so, ss, jnp.int32(0), cam, gt, normal,
                                jnp.int32(3), bg)

    assert int(met["num_dropped"]) == 0
    np.testing.assert_allclose(float(met["loss"]), float(bmet["loss"]),
                               rtol=1e-5)
    for name in ("means", "quats", "log_scales", "sh_dc", "sh_rest",
                 "opacity_logit"):
        a = np.asarray(getattr(nf, name))
        b = np.asarray(getattr(bf, name))
        # Adam normalizes near-zero grads (update -> +-lr * m/sqrt(v)), so
        # f32 reassociation through the exchange can flip a tail update by
        # O(lr); bound absolutely at a fraction of the smallest LR.
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(ns.denom), np.asarray(bs.denom))
    np.testing.assert_allclose(
        np.asarray(ns.xyz_gradient_accum), np.asarray(bs.xyz_gradient_accum),
        rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ns.max_radii2d),
                               np.asarray(bs.max_radii2d))

    # Shardings actually hold: every [C, ...] leaf is split over the axis.
    assert nf.means.sharding.spec[0] == "shard"
    assert no.mu.means.sharding.spec[0] == "shard"
    assert ns.denom.sharding.spec[0] == "shard"


def test_dp_tp_hybrid_step_matches_dp(rng):
    """2D (data, shard) hybrid step: 2 cameras x 4-way-sharded field must
    match the plain 2-device DP step (replicated field) on params, stats
    and loss."""
    from vegs_tpu.parallel.tp_trainer import (
        make_dp_mesh_2d, make_dp_tp_train_step, shard_train_state)
    from utils import make_camera

    h, w = 48, 96
    prng = np.random.default_rng(11)
    pts = prng.normal(size=(300, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (300, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=512)
    cams = []
    for i in range(2):
        th = np.pi / 7 * i
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        cams.append(make_camera(height=h, width=w, R=R,
                                t=np.array([0, 0, 4.0])))
    gt = jnp.asarray(prng.uniform(0, 1, (2, 3, h, w)), jnp.float32)
    normal = jnp.zeros((2, 3, h, w), jnp.float32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    opt_cfg = OptimizationParams()
    raster = RasterizeConfig(backend="dense", k_cap=1 << 13,
                             payload_dtype="f32")
    cam_batch = stack_camera_batch(cams)

    # Baseline: plain DP on 2 devices (replicated field).
    base = make_dp_train_step(make_mesh(2), opt_cfg, raster,
                              spatial_scale=4.0, height=h, width=w)
    bf, bo, bs, bstep, bmet = base(
        field, optim.adam_init(field), DensifyStats.zeros(field.capacity),
        jnp.int32(0), cam_batch, gt, normal, jnp.int32(3), bg)

    # Hybrid: (data=2, shard=4) mesh, field sharded 4-way.
    mesh = make_dp_mesh_2d(2, 4)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    hyb = make_dp_tp_train_step(mesh, opt_cfg, raster, spatial_scale=4.0,
                                cam=cams[0])
    nf, no, ns, nstep, met = hyb(sf, so, ss, jnp.int32(0), cam_batch, gt,
                                 normal, jnp.int32(3), bg)

    np.testing.assert_allclose(float(met["loss"]), float(bmet["loss"]),
                               rtol=1e-5)
    for name in ("means", "quats", "log_scales", "sh_dc", "sh_rest",
                 "opacity_logit"):
        a = np.asarray(getattr(nf, name))
        b = np.asarray(getattr(bf, name))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5, err_msg=name)
    np.testing.assert_allclose(np.asarray(ns.denom), np.asarray(bs.denom))
    np.testing.assert_allclose(
        np.asarray(ns.xyz_gradient_accum), np.asarray(bs.xyz_gradient_accum),
        rtol=1e-4, atol=1e-6)
    assert nf.means.sharding.spec[0] == "shard"


def test_tp_densify_matches_single_device_decisions(rng):
    """Shard-local densify: clone/split/prune decisions are row-local, so
    the sharded recompaction must produce the same total count and the same
    multiset of kept+cloned rows as the single-device densify (split
    children are random samples, so only their count is compared)."""
    from vegs_tpu import densify
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (shard_train_state,
                                              tp_densify_and_prune)

    prng = np.random.default_rng(3)
    pts = prng.normal(size=(400, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (400, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=512)
    opt = optim.adam_init(field)
    # Fabricated stats: high gradient on some rows (drives clone/split),
    # low opacity on none (prune only via invalid rows).
    accum = jnp.asarray(prng.uniform(0, 4e-4, 512), jnp.float32)
    stats = DensifyStats(
        max_radii2d=jnp.zeros(512), xyz_gradient_accum=accum,
        denom=jnp.ones(512))
    kw = dict(grad_threshold=2e-4, percent_dense=0.01, extent=4.0,
              min_opacity=0.005, max_screen_size=0)

    key = jax.random.key(5)
    # Shard + snapshot BEFORE the single-device call: densify_and_prune
    # donates (deletes) its field/opt inputs.
    mesh = make_tile_mesh(8)
    # Fresh Adam state for the sharded copy: device_put of a replicated
    # scalar (Adam count) can alias the original buffer, which the
    # reference call below donates.
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   stats)
    means_host = np.asarray(field.means).copy()
    valid_host = np.asarray(field.valid).copy()
    clone, split, prune = densify.densify_masks(
        field, stats, kw["grad_threshold"], kw["percent_dense"],
        kw["extent"], kw["min_opacity"], kw["max_screen_size"])
    clone, split, prune = (np.asarray(clone), np.asarray(split),
                           np.asarray(prune))

    rf, ro, rs, rn = densify.densify_and_prune(field, opt, stats, key, **kw)
    nf, no, ns, nn = tp_densify_and_prune(mesh, sf, so, ss, key, **kw)

    assert nn == rn, (nn, rn)
    assert int(jnp.sum(nf.valid.astype(jnp.int32))) == rn
    # kept + cloned rows are deterministic: compare as multisets of means
    keep = valid_host & ~prune & ~split
    want = np.concatenate([means_host[keep], means_host[clone]])
    got = np.asarray(nf.means)[np.asarray(nf.valid)]
    # every wanted row appears in the sharded result
    got_set = {tuple(np.round(r, 5)) for r in got}
    missing = [r for r in want if tuple(np.round(r, 5)) not in got_set]
    assert not missing, f"{len(missing)} kept/cloned rows missing"
    # shardings hold and per-shard capacity is uniform
    assert nf.means.sharding.spec[0] == "shard"
    assert nf.capacity % 8 == 0


def test_tp_full_model_step_matches_single_device(rng):
    """FULL VEGS model (static + box slots + deltas) fully sharded: the
    8-device step must match the single-device make_train_step on static
    params, box params, deltas, and both densify-stat sets."""
    from vegs_tpu.boxmodel import BoxDeltas
    from vegs_tpu.train import BoxSlotState, TrainState, make_train_step
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (make_tp_full_train_step,
                                              shard_train_state)
    from utils import make_camera

    h, w = 48, 96
    S, bcap = 2, 64
    prng = np.random.default_rng(13)
    pts = prng.normal(size=(300, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (300, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=512)
    # Default scale clip (NOT the reference's 1e-4 box clip): sub-pixel box
    # Gaussians have ~0 gradients, and Adam's first step is lr*sign(grad) —
    # reassociation noise would flip signs and break step-level parity for
    # entries that carry no real signal.
    bpts = prng.uniform(-0.45, 0.45, (S, 48, 3)).astype(np.float32)
    bfields = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[gaussians.create_from_points(bpts[i], capacity=bcap)
          for i in range(S)])
    box_opt = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[optim.adam_init(jax.tree.map(lambda v: v[i], bfields))
          for i in range(S)])
    box_stats = jax.tree.map(
        lambda *x: jnp.stack(x), *[DensifyStats.zeros(bcap) for _ in range(S)])
    ident = BoxDeltas.identity()
    deltas = jax.tree.map(
        lambda x: jnp.tile(x, (S,) + (1,) * x.ndim), ident)
    delta_opt = optim.tensor_adam_init(dict(
        delta_r=deltas.delta_r, delta_s=deltas.delta_s,
        delta_t=deltas.delta_t))
    b2w = jnp.tile(jnp.eye(4), (S, 1, 1)).at[:, 2, 3].set(2.5)
    active = jnp.ones((S,), bool)

    cam = make_camera(height=h, width=w, t=np.array([0, 0, 4.0]))
    gt = jnp.asarray(prng.uniform(0, 1, (3, h, w)), jnp.float32)
    normal = jnp.asarray(prng.normal(size=(3, h, w)), jnp.float32)
    normal = normal / jnp.linalg.norm(normal, axis=0, keepdims=True)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    opt_cfg = OptimizationParams()
    raster = RasterizeConfig(backend="dense", k_cap=1 << 13,
                             payload_dtype="f32")
    kw = dict(use_normal_loss=True, box_lr_mult=2.0,
              boxmodel_lr=1e-3, boxmodel_lambda_reg=1e-2)

    # Single-device baseline (the real trainer's step).
    single = make_train_step(opt_cfg, raster, spatial_scale=4.0,
                             n_box_slots=S, **kw)
    st0 = TrainState(field=field, opt=optim.adam_init(field),
                     stats=DensifyStats.zeros(field.capacity),
                     step=jnp.int32(0))
    bs0 = BoxSlotState(fields=bfields, opt=box_opt, stats=box_stats)
    st2, bs2, dl2, do2, bmet = single(
        st0, bs0, deltas, delta_opt, b2w, active, cam, gt, normal,
        jnp.float32(1.0), jnp.int32(3), bg)

    # Fully sharded step on the 8-device mesh.
    mesh = make_tile_mesh(8)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    bshard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "shard"))
    put_b = lambda t: jax.tree.map(
        lambda x: jax.device_put(x, bshard) if x.ndim >= 2
        else jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), t)
    tp = make_tp_full_train_step(
        mesh, opt_cfg, raster, spatial_scale=4.0, cam=cam,
        n_box_slots=S, **kw)
    (nf, no, ns, nstep, nbf, nbo, nbs, ndl, ndo, met) = tp(
        sf, so, ss, jnp.int32(0), put_b(bfields), put_b(box_opt),
        put_b(box_stats), deltas, delta_opt, b2w, active, cam, gt, normal,
        jnp.float32(1.0), jnp.int32(3), bg)

    np.testing.assert_allclose(float(met["loss"]), float(bmet["loss"]),
                               rtol=1e-5)
    flip_bound = {"means": 2e-3, "quats": 2.2e-3, "log_scales": 2.2e-3,
                  "sh_dc": 5.5e-3, "opacity_logit": 0.11}
    for name in ("means", "quats", "log_scales", "sh_dc", "opacity_logit"):
        np.testing.assert_allclose(
            np.asarray(getattr(nf, name)), np.asarray(getattr(st2.field, name)),
            rtol=2e-4, atol=1e-5, err_msg=f"static.{name}")
        # Entries with ~0 true gradient take an lr*sign(noise) first Adam
        # step whose sign f32 reassociation can flip (diff up to 2*lr of
        # that leaf's param group): require >=95% of entries tight and
        # bound ALL by one flipped Adam step.
        a = np.asarray(getattr(nbf, name))
        b = np.asarray(getattr(bs2.fields, name))
        diff = np.abs(a - b)
        tight = diff <= 1e-5 + 2e-4 * np.abs(b)
        assert tight.mean() >= 0.95, f"box.{name}: {tight.mean():.3f} tight"
        assert diff.max() <= flip_bound[name], (
            f"box.{name}: max diff {diff.max()}")
    for k in ("delta_r", "delta_s", "delta_t"):
        np.testing.assert_allclose(
            np.asarray(getattr(ndl, k)), np.asarray(getattr(dl2, k)),
            rtol=1e-4, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(ns.denom),
                               np.asarray(st2.stats.denom))
    np.testing.assert_allclose(np.asarray(nbs.denom),
                               np.asarray(bs2.stats.denom))
    np.testing.assert_allclose(
        np.asarray(nbs.xyz_gradient_accum),
        np.asarray(bs2.stats.xyz_gradient_accum), rtol=1e-4, atol=1e-6)
    assert nf.means.sharding.spec[0] == "shard"
    assert nbf.means.sharding.spec[1] == "shard"


def test_tp_training_descends(rng):
    """The fully sharded step actually LEARNS: render a target from the
    clean field, perturb the colors, and verify repeated TP steps drive the
    loss down by 2x and restore PSNR.

    CI-sized (round-2 item 6, round-3 item 8): 32x64 / k_cap 4096 cuts the
    8-device CPU-mesh step ~4x (was 479 s at 48x96 / 8192), and a 4x
    feature LR recovers the color perturbation in 14 steps instead of 40
    (266 s -> ~95 s); the learning dynamics under test are LR- and
    resolution-independent."""
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (make_tp_train_step,
                                              shard_train_state)
    from vegs_tpu.losses import psnr
    from vegs_tpu.train import eval_render
    from utils import make_camera

    h, w = 32, 64
    prng = np.random.default_rng(17)
    pts = prng.normal(size=(300, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (300, 3)).astype(np.float32)
    clean = gaussians.create_from_points(pts, cols, capacity=512)
    cam = make_camera(height=h, width=w, t=np.array([0, 0, 4.0]))
    bg = jnp.zeros(3)
    raster = RasterizeConfig(backend="dense", k_cap=1 << 12,
                             payload_dtype="f32")
    gt = jnp.clip(eval_render(clean, cam, bg, 3, raster).rgb, 0, 1)

    field = clean.replace(sh_dc=clean.sh_dc + 0.35)
    mesh = make_tile_mesh(8)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    tp = make_tp_train_step(mesh, OptimizationParams(feature_lr=0.01),
                            raster, spatial_scale=4.0, cam=cam)
    step = jnp.int32(0)
    normal = jnp.zeros((3, h, w))
    losses = []
    for _ in range(14):
        sf, so, ss, step, met = tp(sf, so, ss, step, cam, gt, normal,
                                   jnp.int32(3), bg)
        losses.append(float(met["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < 0.5 * np.mean(losses[:3])
    recovered = eval_render(jax.device_get(sf), cam, bg, 3, raster)
    assert float(psnr(jnp.clip(recovered.rgb, 0, 1), gt)) > 22


def test_tp_full_step_with_guidance_matches_single_device(rng):
    """Round-3 VERDICT item 3 (+ round-4 item 5): the diffusion-guidance
    window + perceptual term exist in the NO-REPLICATION regime, with the
    REAL (tiny) SD stack — VAE encode + CFG UNet noise prediction running
    replicated inside shard_map — not a synthetic score callable. A TP
    full-model step with both enabled must match the single-device step
    with the same in-step extras."""
    from vegs_tpu.boxmodel import BoxDeltas
    from vegs_tpu.train import BoxSlotState, TrainState, make_train_step
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (make_tp_full_train_step,
                                              shard_train_state)
    from vegs_tpu.losses import vgg as vgg_lib
    from utils import make_camera

    h, w = 48, 96
    ha, wa = 32, 64
    S, bcap = 1, 64
    prng = np.random.default_rng(23)
    pts = prng.normal(size=(300, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (300, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=512)
    bpts = prng.uniform(-0.45, 0.45, (S, 48, 3)).astype(np.float32)
    bfields = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[gaussians.create_from_points(bpts[i], capacity=bcap)
          for i in range(S)])
    box_opt = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[optim.adam_init(jax.tree.map(lambda v: v[i], bfields))
          for i in range(S)])
    box_stats = jax.tree.map(
        lambda *x: jnp.stack(x), *[DensifyStats.zeros(bcap) for _ in range(S)])
    ident = BoxDeltas.identity()
    deltas = jax.tree.map(lambda x: jnp.tile(x, (S,) + (1,) * x.ndim), ident)
    delta_opt = optim.tensor_adam_init(dict(
        delta_r=deltas.delta_r, delta_s=deltas.delta_s,
        delta_t=deltas.delta_t))
    b2w = jnp.tile(jnp.eye(4), (S, 1, 1)).at[:, 2, 3].set(2.5)
    active = jnp.ones((S,), bool)

    cam = make_camera(height=h, width=w, t=np.array([0, 0, 4.0]))
    aug_cam = make_camera(height=ha, width=wa, t=np.array([0.2, 0, 4.0]))
    gt = jnp.asarray(prng.uniform(0, 1, (3, h, w)), jnp.float32)
    normal = jnp.asarray(prng.normal(size=(3, h, w)), jnp.float32)
    normal = normal / jnp.linalg.norm(normal, axis=0, keepdims=True)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    opt_cfg = OptimizationParams()
    raster = RasterizeConfig(backend="dense", k_cap=1 << 13,
                             payload_dtype="f32")

    # The real (tiny) diffusion stack: crop is (3, ha, ha) = 32x32, the
    # tiny VAE's native size. sm_lambda scaled so the score term is
    # comparable to the photometric loss.
    from vegs_tpu.diffusion.pipeline import DiffusionModels
    from vegs_tpu.losses.sd_guidance import SDGuidance

    models = DiffusionModels.tiny(jax.random.key(0), image_size=ha)
    guidance = SDGuidance(models, guidance_mode="score-matching",
                          start_iter=0, max_iters=30, max_step=50,
                          sm_lambda=1e-5)

    vgg_params = vgg_lib.init_params(jax.random.key(3))
    extras = dict(aug_cam=aug_cam,
                  crop_start=jnp.int32(7), gkey=jax.random.key(11),
                  vgg_params=vgg_params)
    kw = dict(use_normal_loss=True, box_lr_mult=2.0,
              boxmodel_lr=1e-3, boxmodel_lambda_reg=1e-2,
              guidance=guidance, perceptual_lam=0.05)

    single = make_train_step(opt_cfg, raster, spatial_scale=4.0,
                             n_box_slots=S, **kw)
    st0 = TrainState(field=field, opt=optim.adam_init(field),
                     stats=DensifyStats.zeros(field.capacity),
                     step=jnp.int32(0))
    bs0 = BoxSlotState(fields=bfields, opt=box_opt, stats=box_stats)
    st2, bs2, dl2, do2, bmet = single(
        st0, bs0, deltas, delta_opt, b2w, active, cam, gt, normal,
        jnp.float32(1.0), jnp.int32(3), bg, None, extras)

    mesh = make_tile_mesh(8)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    bshard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "shard"))
    put_b = lambda t: jax.tree.map(
        lambda x: jax.device_put(x, bshard) if x.ndim >= 2
        else jax.device_put(x, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())), t)
    tp = make_tp_full_train_step(
        mesh, opt_cfg, raster, spatial_scale=4.0, cam=cam,
        n_box_slots=S, aug_cam=aug_cam, **kw)
    (nf, no, ns, nstep, nbf, nbo, nbs, ndl, ndo, met) = tp(
        sf, so, ss, jnp.int32(0), put_b(bfields), put_b(box_opt),
        put_b(box_stats), deltas, delta_opt, b2w, active, cam, gt, normal,
        jnp.float32(1.0), jnp.int32(3), bg, extras)

    np.testing.assert_allclose(float(met["loss"]), float(bmet["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(met["guidance_loss"]),
                               float(bmet["guidance_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(met["perceptual_loss"]),
                               float(bmet["perceptual_loss"]), rtol=1e-4)
    assert float(bmet["guidance_loss"]) != 0.0
    assert float(bmet["perceptual_loss"]) != 0.0
    for name in ("means", "quats", "log_scales", "sh_dc", "opacity_logit"):
        a = np.asarray(getattr(nf, name))
        b = np.asarray(getattr(st2.field, name))
        diff = np.abs(a - b)
        tight = diff <= 1e-5 + 2e-4 * np.abs(b)
        assert tight.mean() >= 0.95, f"static.{name}: {tight.mean():.3f}"
        assert diff.max() <= 5.2e-3, f"static.{name}: max {diff.max()}"
    assert nf.means.sharding.spec[0] == "shard"


def test_tp_k_cap_adapts_grow_and_decay(rng):
    """Sharded capacity adaptation (round-3 verdict item 7): a TP run that
    overflows its instance capacity reports num_dropped > 0 and KCapAdapter
    grows k_cap across rebuilds; a run sitting far under capacity reports
    num_needed (global-k_cap units) and the adapter decays after the streak
    window, with the decayed capacity verified drop-free — both transitions
    exercised through the real TP step. (Each run_once is a fresh compile;
    the dense golden blend is O(k_blend * HW) on CPU, so caps stay small.)"""
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (
        KCapAdapter, make_tp_train_step, shard_train_state)
    from utils import make_camera

    h, w = 32, 64
    prng = np.random.default_rng(3)
    pts = prng.normal(size=(300, 3)).astype(np.float32)
    cols = prng.uniform(0, 1, (300, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=512)
    # Big footprints: each splat covers many tiles, so the 512-slot local
    # stream floor (k_loc) genuinely overflows at the smallest k_cap.
    field_big = field.replace(log_scales=field.log_scales + 1.5)
    cam = make_camera(height=h, width=w, t=np.array([0, 0, 4.0]))
    gt = jnp.zeros((3, h, w))
    normal = jnp.zeros((3, h, w))
    bg = jnp.zeros(3)
    opt_cfg = OptimizationParams()
    mesh = make_tile_mesh(8)

    def run_once(f, k_cap):
        raster = RasterizeConfig(backend="dense", k_cap=k_cap,
                                 payload_dtype="f32")
        sf, so, ss = shard_train_state(
            mesh, f, optim.adam_init(f), DensifyStats.zeros(f.capacity))
        step = make_tp_train_step(mesh, opt_cfg, raster, spatial_scale=4.0,
                                  cam=cam)
        _, _, _, _, met = step(sf, so, ss, jnp.int32(0), cam, gt, normal,
                               jnp.int32(0), bg)
        return float(met["num_dropped"]), float(met["num_needed"])

    # Grow: k_loc = 4096/8 = 512 local slots is too small for the big-splat
    # scene (measured: ~15.5k instances needed) -> two growth transitions.
    adapter = KCapAdapter(k_cap=1 << 12, decay_window=3)
    dropped, needed = run_once(field_big, adapter.k_cap)
    assert dropped > 0
    assert adapter.update(dropped, needed) == 1 << 13
    dropped2, needed2 = run_once(field_big, adapter.k_cap)
    assert dropped2 > 0 and dropped2 < dropped  # rebuilt cap admits more
    assert adapter.update(dropped2, needed2) == 1 << 14
    # num_needed is the smallest global capacity that admits everything
    # (worst shard x ndev) and is stable across reruns of the same frame.
    assert needed2 == needed and needed <= adapter.k_cap

    # The small-splat scene fits 2^12 with room (needed ~3.2k): num_needed
    # <= k_cap really does mean drop-free.
    d_s, n_s = run_once(field, 1 << 12)
    assert d_s == 0 and 0 < n_s <= 1 << 12

    # Decay: at 2^14 the small scene sits under 25% utilization; after the
    # 3-step streak the adapter halves, and the decayed capacity still
    # admits every instance (verified through the rebuilt step).
    adapter = KCapAdapter(k_cap=1 << 14, k_cap_min=1 << 12, decay_window=3)
    out = None
    for i in range(3):
        assert n_s < 0.25 * adapter.k_cap
        out = adapter.update(d_s, n_s)
        assert (out is None) if i < 2 else (out == 1 << 13)
    d_dec, _ = run_once(field, adapter.k_cap)
    assert d_dec == 0
