"""KCapAdapter BOTH-transition demo on a real TP workload (round-4 verdict
item 9 addendum: the main quality_tp_r05 run only exercised decay — its
scene is stable, so after decaying to sufficiency the adapter correctly
never grows).

This run starts UNDER-provisioned (k_cap 1024 < the scene's ~3.5k-instance
need), so the first steps drop instances and the adapter GROWS to
sufficiency; at iteration 120 the harness swaps in a deliberately stale
32768 cap (simulating a resume from a denser checkpoint), after which the
adapter DECAYS back down. Appends the event table to QUALITY_TP_r05.md.

Run (virtual CPU mesh):
  PYTHONPATH=. JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \
  env -u PALLAS_AXON_POOL_IPS python perf/quality_tp_r05b_adapter.py
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb

_xb._backend_factories.pop("axon", None)
if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()

import jax.numpy as jnp
import numpy as np

import quality_tp_full as qtf

ITERS = 240
SWAP_AT = 120
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "QUALITY_TP_r05.md")


def main():
    from vegs_tpu import optim
    from vegs_tpu.boxmodel import BoxDeltas
    from vegs_tpu.config import OptimizationParams
    from vegs_tpu.gaussians import DensifyStats
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.parallel.tile_sharded import make_tile_mesh
    from vegs_tpu.parallel.tp_trainer import (KCapAdapter,
                                              make_tp_full_train_step,
                                              shard_train_state)

    rng = np.random.default_rng(5)
    field, bfield, train_cams, test_cams, true_b2w, noisy_b2w = \
        qtf.build_scene(rng)
    opt_cfg = OptimizationParams()
    mesh = make_tile_mesh(4)
    spatial = 6.0
    kw = dict(use_normal_loss=True, box_lr_mult=2.0, boxmodel_lr=1e-3,
              boxmodel_lambda_reg=1e-2)

    stack1 = lambda t: jax.tree.map(lambda x: x[None], t)
    ident = BoxDeltas.identity()
    dopt0 = optim.tensor_adam_init(dict(
        delta_r=ident.delta_r[None], delta_s=ident.delta_s[None],
        delta_t=ident.delta_t[None]))
    active = jnp.ones((1,), bool)

    rcfg = RasterizeConfig(backend="dense", k_cap=1024)
    adapter = KCapAdapter(rcfg.k_cap, k_cap_min=512, decay_window=25)
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

    def build(cfg):
        return make_tp_full_train_step(
            mesh, opt_cfg, cfg, spatial_scale=spatial,
            cam=train_cams[0].device_params(), n_box_slots=1, **kw)

    tp = build(rcfg)
    dmap = {f: (stack1(ident), dopt0) for f in range(qtf.N_CAMS)}
    step = jnp.int32(0)
    events = []
    r = np.random.default_rng(17)
    t0 = time.time()
    for it in range(1, ITERS + 1):
        cam = train_cams[int(r.integers(len(train_cams)))]
        f = int(cam.frame)
        gt = jnp.asarray(cam.original_image)
        normal = jnp.asarray(cam.world_normal())
        b2w = jnp.asarray(noisy_b2w[f])[None]
        deltas, dopt = dmap[f]
        (sf, so, ss, step, bf, bo, bstats, deltas, dopt, met) = tp(
            sf, so, ss, step, bf, bo, bstats, deltas, dopt, b2w, active,
            cam.device_params(), gt, normal, jnp.float32(1.0), jnp.int32(3),
            jnp.zeros(3))
        dmap[f] = (deltas, dopt)
        if it == SWAP_AT:
            # stale-cap resume simulation: hand the adapter a 32x cap
            adapter.k_cap = 32768
            adapter._low_streak = 0
            rcfg = rcfg._replace(k_cap=32768)
            tp = build(rcfg)
            events.append((it, "stale-resume", 32768))
            print(f"[adapter-demo] it {it}: stale-resume -> 32768",
                  flush=True)
        new = adapter.update(float(met["num_dropped"]),
                             float(met["num_needed"]))
        if new is not None:
            kind = "grow" if float(met["num_dropped"]) > 0 else "decay"
            events.append((it, kind, new))
            rcfg = rcfg._replace(k_cap=new)
            tp = build(rcfg)
            print(f"[adapter-demo] it {it}: {kind} -> {new} "
                  f"(dropped {int(met['num_dropped'])}, needed "
                  f"{int(met['num_needed'])}) ({time.time()-t0:.0f}s)",
                  flush=True)

    kinds = {k for _, k, _ in events}
    lines = [
        "",
        "## 3b. KCapAdapter both-transition demo "
        "(perf/quality_tp_r05b_adapter.py)",
        "",
        "The main run's adapter only decayed (the scene is stable: after",
        "decaying to sufficiency there is nothing to grow for — correct",
        "behavior). This demo starts UNDER-provisioned (k_cap 1024 < the",
        "~3.5k-instance need) so the adapter GROWS out of real drops, then",
        "swaps in a stale 32768 cap at iteration 120 (resume-from-denser-",
        "checkpoint simulation) and the adapter DECAYS back:",
        "",
        "| iter | event | new k_cap |",
        "|---|---|---|",
    ]
    for it, kind, new in events:
        lines.append(f"| {it} | {kind} | {new} |")
    lines += ["", f"Transitions observed: {sorted(kinds)}; every rebuild is "
              "a real make_tp_full_train_step rebuild driven by the step's "
              "own (num_dropped, num_needed) metrics.",
              f"Wall-clock: {time.time()-t0:.0f} s."]
    with open(OUT, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print("appended adapter demo to", OUT)


if __name__ == "__main__":
    main()
