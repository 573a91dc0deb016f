"""Round-2 backward bisect: where do the ~100 unaccounted ms of the full
fwd+bwd go?  Measures fwd+bwd with the loss planted at successive pipeline
depths, plus grad-subset variants.  In-jit loop differencing as usual.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tests.utils import make_camera, random_gaussians
from vegs_tpu import geometry
from vegs_tpu.ops import binning, blend_pallas
from vegs_tpu.ops.projection import project
from vegs_tpu.ops.rasterize import gather_expand

H, W = 376, 1408
N = 500_000
K_CAP = 1 << 21


def timeit(name, fn, args, iters=8):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            s = fn(args, acc)
            return args, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:55s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    cam = make_camera(height=H, width=W, fovx=1.2, fovy=0.4)
    rng = np.random.default_rng(0)
    means, quats, scales, opac, shs = random_gaussians(
        rng, N, depth_range=(2.0, 60.0), xy_extent=40.0,
        scale_range=(0.002, 0.025))
    z = np.asarray(rng.uniform(2.0, 60.0, N), np.float32)
    u = rng.uniform(-0.95, 0.95, N)
    v = rng.uniform(-0.95, 0.95, N)
    means = jnp.asarray(np.stack([
        z * np.tan(0.6) * u, z * np.tan(0.2) * v, z], axis=1, dtype=np.float32))
    grid = binning.TileGrid.for_image(H, W)
    hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w

    def dep(x, acc):
        return x + jnp.sin(acc) * 1e-20

    args0 = (means, quats, scales, opac, shs)

    def pipeline(m, q, s, o, sh, upto):
        cov6 = geometry.cov6_from_scaling_rotation(s, q)
        p = project(m, cov6, o, sh, cam)
        if upto == "project":
            return (jnp.sum(p.means2d) + jnp.sum(p.rgb) + jnp.sum(p.conics)
                    + jnp.sum(p.depths) + jnp.sum(p.opacities))
        quat_n = geometry.quat_standardize(geometry.quat_normalize(q))
        pay_f32 = jnp.concatenate(
            [p.means2d, p.conics, p.opacities[:, None], p.depths[:, None],
             jnp.zeros((N, 1), jnp.float32)], axis=1)
        pay_aux = jnp.concatenate(
            [p.rgb, quat_n, s, jnp.zeros((N, 6), jnp.float32)],
            axis=1).astype(jnp.bfloat16)
        if upto == "payload":
            return jnp.sum(pay_f32) + jnp.sum(pay_aux).astype(jnp.float32)
        b = binning.bin_gaussians(
            jax.lax.stop_gradient(p.means2d), jax.lax.stop_gradient(p.depths),
            p.radii_xy, grid, K_CAP)
        pf, pa = gather_expand(
            jnp.pad(pay_f32, ((0, 1), (0, 0))),
            jnp.pad(pay_aux, ((0, 1), (0, 0))), b.gidx, b.order,
            jnp.concatenate([b.gauss_ends, b.gauss_ends[-1:]]))
        pfT, paT = pf.T, pa.T
        if upto == "gather":
            return jnp.sum(pfT) + jnp.sum(paT).astype(jnp.float32)
        out = blend_pallas.blend(pfT, paT, b.tile_starts, grid, hp, wp)
        return jnp.mean(out[0:3] ** 2) + 0.01 * jnp.mean(out[3:4] ** 2)

    for upto in ["project", "payload", "gather", "blend"]:
        def fb_all(args, acc, upto=upto):
            m, q, s, o, sh = args
            l, g = jax.value_and_grad(
                lambda *a: pipeline(*a, upto), argnums=(0, 1, 2, 3, 4))(
                dep(m, acc), q, s, o, sh)
            return l + sum(jnp.sum(x) for x in g) * 1e-9
        timeit(f"fwd+bwd(all params) upto {upto}", fb_all, args0)

    def fb_means(args, acc):
        m, q, s, o, sh = args
        l, g = jax.value_and_grad(
            lambda *a: pipeline(*a, "blend"), argnums=(0,))(
            dep(m, acc), q, s, o, sh)
        return l + jnp.sum(g[0]) * 1e-9
    timeit("fwd+bwd(means only) upto blend", fb_means, args0)

    # fwd+bwd with the blend treated as identity on payloads: plant cotangents
    # directly on the gathered payload, but keep blend in the FORWARD graph
    # (detached) so fwd cost matches.
    def fb_skipblendbwd(args, acc):
        m, q, s, o, sh = args
        def loss(m, q, s, o, sh):
            cov6 = geometry.cov6_from_scaling_rotation(s, q)
            p = project(m, cov6, o, sh, cam)
            quat_n = geometry.quat_standardize(geometry.quat_normalize(q))
            pay_f32 = jnp.concatenate(
                [p.means2d, p.conics, p.opacities[:, None], p.depths[:, None],
                 jnp.zeros((N, 1), jnp.float32)], axis=1)
            pay_aux = jnp.concatenate(
                [p.rgb, quat_n, s, jnp.zeros((N, 6), jnp.float32)],
                axis=1).astype(jnp.bfloat16)
            b = binning.bin_gaussians(
                jax.lax.stop_gradient(p.means2d),
                jax.lax.stop_gradient(p.depths), p.radii_xy, grid, K_CAP)
            pf, pa = gather_expand(
                jnp.pad(pay_f32, ((0, 1), (0, 0))),
                jnp.pad(pay_aux, ((0, 1), (0, 0))), b.gidx, b.order,
                jnp.concatenate([b.gauss_ends, b.gauss_ends[-1:]]))
            pfT, paT = pf.T, pa.T
            out = blend_pallas.blend(
                jax.lax.stop_gradient(pfT), jax.lax.stop_gradient(paT),
                b.tile_starts, grid, hp, wp)
            return (jnp.mean(out[0:3] ** 2)
                    + jnp.sum(pfT) * 1e-9 + jnp.sum(paT).astype(jnp.float32) * 1e-9)
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            dep(m, acc), q, s, o, sh)
        return l + sum(jnp.sum(x) for x in g) * 1e-9
    timeit("fwd(full)+bwd skipping blend-bwd", fb_skipblendbwd, args0)


if __name__ == "__main__":
    main()
