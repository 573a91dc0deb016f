"""FULL-MODEL quality evidence for the FULLY SHARDED trainer (round-3
verdict item 6: boxes in the loop, >=500 iterations WITH shard-local
densify/recompaction between windows, TP tracking the single-device PSNR
within ~0.5 dB at equal iteration count).

Trains the ray-traced street oracle WITH its moving vehicle through
`make_tp_full_train_step`: static field + the box slot's canonical field +
densify stats all sharded over the mesh, per-frame SE(3)+scale BoxDeltas
replicated (psum'd gradients), tile-sharded rendering with one all_to_all.
The SAME scene / init / camera sequence first runs through the production
single-device `make_train_step`; QUALITY_TP_r03.md reports both PSNR
trajectories side by side (written incrementally after every TP eval).

Run (virtual CPU mesh — the only multi-device surface in this image):
  PYTHONPATH=. JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  env -u PALLAS_AXON_POOL_IPS python perf/quality_tp_full.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb

# A downed TPU tunnel makes axon plugin init hang (see tests/conftest.py).
_xb._backend_factories.pop("axon", None)
if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()

import jax.numpy as jnp
import numpy as np

H, W = 32, 64
N_CAMS = 9
ITERS = int(os.environ.get("VEGS_TPF_ITERS", "500"))
EVAL_EVERY = int(os.environ.get("VEGS_TPF_EVAL_EVERY", "50"))
NDEV = int(os.environ.get("VEGS_TPF_NDEV", "4"))
BOX_NOISE_T = 0.06
DENSIFY_FROM = int(os.environ.get("VEGS_TPF_DENSIFY_FROM", "100"))
DENSIFY_UNTIL = int(os.environ.get("VEGS_TPF_DENSIFY_UNTIL", "400"))
DENSIFY_EVERY = int(os.environ.get("VEGS_TPF_DENSIFY_EVERY", "100"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "QUALITY_TP_r04.md")


def build_scene(rng):
    from vegs_tpu import gaussians
    from vegs_tpu.scene.dataset_readers import camera_from_info
    from vegs_tpu.utils import synthetic as syn

    infos = syn.street_camera_infos(N_CAMS, H, W, moving_box=True,
                                    render_normal=True)
    cams = [camera_from_info(ci) for ci in infos]
    train_cams = [c for i, c in enumerate(cams) if i % 8 != 0]
    test_cams = [c for i, c in enumerate(cams) if i % 8 == 0]

    pts, cols = syn.sample_scene_points(rng, n_ground=400, n_box=100,
                                        n_sky=600)
    field = gaussians.create_from_points(
        pts, cols, capacity=gaussians.round_capacity(pts.shape[0], 512))

    canon, ccols = syn.mover_canonical_points(rng, n=96)
    bfield = gaussians.create_from_points(canon, ccols, capacity=128)
    true_b2w, noisy_b2w = {}, {}
    for f in range(N_CAMS):
        m = syn.mover_box2world(f, N_CAMS)
        true_b2w[f] = m
        noise = np.eye(4, dtype=np.float32)
        noise[:3, 3] = rng.normal(0, BOX_NOISE_T, 3).astype(np.float32)
        noisy_b2w[f] = (noise @ m).astype(np.float32)
    return field, bfield, train_cams, test_cams, true_b2w, noisy_b2w


def make_eval(test_cams, noisy_b2w, eval_raster):
    from vegs_tpu.boxmodel import BoxDeltas, adjust_box2world
    from vegs_tpu.losses import psnr
    from vegs_tpu.render import (_concat_arrays, _run, field_arrays,
                                 transform_field_arrays)

    def evaluate(field, bfield, deltas_map):
        vals = []
        for c in test_cams:
            f = int(c.frame)
            d = deltas_map.get(f, (BoxDeltas.identity(), None))[0]
            b2w = adjust_box2world(jnp.asarray(noisy_b2w[f]), d)
            parts = [field_arrays(field, 3),
                     transform_field_arrays(field_arrays(bfield, 3), b2w)]
            out = _run(c.device_params(), _concat_arrays(parts),
                       bg=jnp.zeros(3), scale_modifier=1.0,
                       override_color=None, sh_degree=3, config=eval_raster,
                       means2d_offset=None)
            vals.append(float(psnr(jnp.clip(out.rgb, 0, 1),
                                   jnp.asarray(c.original_image))))
        return float(np.mean(vals))
    return evaluate


def write_md(single_trend, tp_trend, wall_single, wall_tp, err_rows):
    by_it = {it: p for it, p in single_trend}
    lines = [
        "# QUALITY_TP_r04 — FULL-MODEL fully sharded trainer quality",
        "",
        "Ray-traced street oracle WITH its moving vehicle box, trained",
        "through `make_tp_full_train_step` (vegs_tpu/parallel/tp_trainer.py):",
        f"static field + box-slot canonical field + densify stats sharded on",
        f"a {NDEV}-device mesh (virtual CPU devices), tile-sharded rendering",
        "with one all_to_all splat exchange, per-frame SE(3)+scale BoxDeltas",
        "replicated with psum'd gradients. The SAME scene, init, and camera",
        "sequence also runs through the production single-device",
        f"`make_train_step` for comparison. {H}x{W}, {N_CAMS} cameras, idx%8",
        f"split, normal-guidance on (GT normal maps), {BOX_NOISE_T} m box",
        f"annotation noise, SHARD-LOCAL densify/recompaction in the loop",
        f"(tp_densify_and_prune every {DENSIFY_EVERY} in",
        f"[{DENSIFY_FROM}, {DENSIFY_UNTIL}]; the single-device run densifies",
        "identically via densify_and_prune, so capacities evolve in both).",
        "",
        "| iteration | single-device PSNR (dB) | TP (sharded) PSNR (dB) |"
        " diff (dB) |",
        "|---|---|---|---|",
    ]
    for it, p in tp_trend:
        sp = by_it.get(it)
        sps = f"{sp:.2f}" if sp is not None else "-"
        df = f"{p - sp:+.2f}" if sp is not None else "-"
        lines.append(f"| {it} | {sps} | {p:.2f} | {df} |")
    lines += ["", "Box-pose translation error (train frames, learned deltas"
              " vs true pose; raw annotation error in parentheses):", ""]
    lines += err_rows
    lines += [
        "",
        f"Wall-clock: single-device {wall_single:.0f} s, TP {wall_tp:.0f} s",
        "(dense golden backend on the virtual CPU mesh; production is the",
        "pallas backend on a real slice — see NOTES_PERF.md for the",
        "real-chip shard_map+pallas run).",
        "Reproduce: see this file's docstring.",
    ]
    with open(OUT, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main():
    from vegs_tpu import densify, optim
    from vegs_tpu.boxmodel import BoxDeltas, adjust_box2world
    from vegs_tpu.config import OptimizationParams
    from vegs_tpu.gaussians import DensifyStats
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (make_tp_full_train_step,
                                              shard_train_state,
                                              tp_densify_and_prune)
    from vegs_tpu.train import BoxSlotState, TrainState, make_train_step

    rng = np.random.default_rng(5)
    field, bfield, train_cams, test_cams, true_b2w, noisy_b2w = \
        build_scene(rng)
    print(f"scene: {int(field.num_active())} static + "
          f"{int(bfield.num_active())} box gaussians, "
          f"{len(train_cams)}/{len(test_cams)} train/test cams", flush=True)

    opt_cfg = OptimizationParams()
    opt_cfg.densify_grad_threshold = 0.0004   # toy-scale NDC grads
    raster = RasterizeConfig(backend="dense", k_cap=8192)
    eval_raster = RasterizeConfig(backend="dense", k_cap=1 << 14)
    spatial = 6.0
    kw = dict(use_normal_loss=True, box_lr_mult=2.0, boxmodel_lr=1e-3,
              boxmodel_lambda_reg=1e-2)
    evaluate = make_eval(test_cams, noisy_b2w, eval_raster)

    # One box slot; stack to [S=1, ...] trees.
    stack1 = lambda t: jax.tree.map(lambda x: x[None], t)
    ident = BoxDeltas.identity()
    dopt0 = optim.tensor_adam_init(dict(
        delta_r=ident.delta_r[None], delta_s=ident.delta_s[None],
        delta_t=ident.delta_t[None]))
    active = jnp.ones((1,), bool)

    def camera_seq():
        r = np.random.default_rng(17)
        for _ in range(ITERS):
            yield train_cams[int(r.integers(len(train_cams)))]

    def frame_inputs(cam):
        f = int(cam.frame)
        gt = jnp.asarray(cam.original_image)
        wn = cam.world_normal()
        normal = jnp.asarray(wn)
        b2w = jnp.asarray(noisy_b2w[f])[None]
        return f, gt, normal, b2w

    def err_rows(deltas_map):
        errs_adj, errs_raw = [], []
        for c in train_cams:
            f = int(c.frame)
            d = deltas_map.get(f, (BoxDeltas.identity(),))[0]
            adj = np.asarray(adjust_box2world(jnp.asarray(noisy_b2w[f]), d))
            errs_adj.append(np.linalg.norm(adj[:3, 3] - true_b2w[f][:3, 3]))
            errs_raw.append(
                np.linalg.norm(noisy_b2w[f][:3, 3] - true_b2w[f][:3, 3]))
        return float(np.mean(errs_adj)), float(np.mean(errs_raw))

    # ---- single-device trajectory (the production step) -------------------
    single = make_train_step(opt_cfg, raster, spatial_scale=spatial,
                             n_box_slots=1, **kw)
    st = TrainState(field=field, opt=optim.adam_init(field),
                    stats=DensifyStats.zeros(field.capacity),
                    step=jnp.int32(0))
    bs = BoxSlotState(fields=stack1(bfield),
                      opt=stack1(optim.adam_init(bfield)),
                      stats=stack1(DensifyStats.zeros(bfield.capacity)))
    dmap_s = {f: (jax.tree.map(lambda x: x[None], ident), dopt0)
              for f in range(N_CAMS)}
    t0 = time.time()
    single_trend = [(0, evaluate(st.field,
                                 jax.tree.map(lambda x: x[0], bs.fields),
                                 {}))]
    print(f"[single] iter 0: psnr {single_trend[0][1]:.2f}", flush=True)
    for it, cam in enumerate(camera_seq(), start=1):
        f, gt, normal, b2w = frame_inputs(cam)
        deltas, dopt = dmap_s[f]
        st, bs, deltas, dopt, met = single(
            st, bs, deltas, dopt, b2w, active, cam.device_params(), gt,
            normal, jnp.float32(1.0), jnp.int32(3), jnp.zeros(3))
        dmap_s[f] = (deltas, dopt)
        if DENSIFY_FROM <= it <= DENSIFY_UNTIL and it % DENSIFY_EVERY == 0:
            f2, o2, s2, n = densify.densify_and_prune(
                st.field, st.opt, st.stats, jax.random.key(100 + it),
                grad_threshold=opt_cfg.densify_grad_threshold,
                percent_dense=opt_cfg.percent_dense, extent=spatial)
            st = TrainState(field=f2, opt=o2, stats=s2, step=st.step)
            print(f"[single] densify at {it}: n={n} cap={f2.capacity}",
                  flush=True)
        if it % EVAL_EVERY == 0:
            bf0 = jax.tree.map(lambda x: x[0], bs.fields)
            dm = {k: (jax.tree.map(lambda x: x[0], v[0]),) for k, v in
                  dmap_s.items()}
            p = evaluate(st.field, bf0, dm)
            single_trend.append((it, p))
            print(f"[single] iter {it}: psnr {p:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    wall_single = time.time() - t0
    dm_s = {k: (jax.tree.map(lambda x: x[0], v[0]),) for k, v in
            dmap_s.items()}
    ea_s, er = err_rows(dm_s)

    # ---- fully sharded trajectory ------------------------------------------
    mesh = make_tile_mesh(NDEV)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    bshard = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "shard"))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    put_b = lambda t: jax.tree.map(
        lambda x: jax.device_put(x, bshard if x.ndim >= 2 else repl), t)
    bf = put_b(stack1(bfield))
    bo = put_b(stack1(optim.adam_init(bfield)))
    bstats = put_b(stack1(DensifyStats.zeros(bfield.capacity)))
    tp = make_tp_full_train_step(
        mesh, opt_cfg, raster, spatial_scale=spatial,
        cam=train_cams[0].device_params(), n_box_slots=1, **kw)
    dmap_t = {f: (jax.tree.map(lambda x: x[None], ident), dopt0)
              for f in range(N_CAMS)}
    step = jnp.int32(0)
    t1 = time.time()
    tp_trend = [(0, single_trend[0][1])]
    for it, cam in enumerate(camera_seq(), start=1):
        f, gt, normal, b2w = frame_inputs(cam)
        deltas, dopt = dmap_t[f]
        (sf, so, ss, step, bf, bo, bstats, deltas, dopt, met) = tp(
            sf, so, ss, step, bf, bo, bstats, deltas, dopt, b2w, active,
            cam.device_params(), gt, normal, jnp.float32(1.0), jnp.int32(3),
            jnp.zeros(3))
        dmap_t[f] = (deltas, dopt)
        if DENSIFY_FROM <= it <= DENSIFY_UNTIL and it % DENSIFY_EVERY == 0:
            sf, so, ss, n = tp_densify_and_prune(
                mesh, sf, so, ss, jax.random.key(100 + it),
                grad_threshold=opt_cfg.densify_grad_threshold,
                percent_dense=opt_cfg.percent_dense, extent=spatial)
            print(f"[tp] shard-local densify at {it}: n={n} "
                  f"cap={sf.capacity}", flush=True)
        if it <= 2 or it % EVAL_EVERY == 0:
            fh = jax.device_get(sf)
            bfh = jax.tree.map(lambda x: np.asarray(x)[0],
                               jax.device_get(bf))
            import vegs_tpu.gaussians as G
            bf0 = jax.tree.map(jnp.asarray, bfh)
            dm = {k: (jax.tree.map(lambda x: x[0], v[0]),) for k, v in
                  dmap_t.items()}
            p = evaluate(jax.tree.map(jnp.asarray, fh), bf0, dm)
            if it % EVAL_EVERY == 0:
                tp_trend.append((it, p))
            print(f"[tp] iter {it}: psnr {p:.2f} "
                  f"({time.time()-t1:.0f}s)", flush=True)
            dmh = {k: (jax.tree.map(lambda x: x[0], v[0]),) for k, v in
                   dmap_t.items()}
            ea_t, _ = err_rows(dmh)
            write_md(single_trend, tp_trend, wall_single, time.time() - t1,
                     [f"- single-device: {ea_s:.3f} m (raw {er:.3f} m)",
                      f"- TP (sharded):  {ea_t:.3f} m (raw {er:.3f} m)"])
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
