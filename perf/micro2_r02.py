"""Follow-up micros: transposes, payload build, binning internals at 2M."""

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

K = 1 << 21
N = 500_000

rng = np.random.default_rng(0)
A8 = jnp.asarray(rng.standard_normal((K, 8), dtype=np.float32))
A16 = jnp.asarray(
    rng.standard_normal((K, 16), dtype=np.float32)).astype(jnp.bfloat16)
CUM = jnp.asarray(np.cumsum(
    rng.integers(0, 8, N).astype(np.int32)).astype(np.int32))
GIDX_RAND = jnp.asarray(rng.integers(0, N, K).astype(np.int32))


def timeit(name, fn, args, iters=8):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            a2, s = fn(args, acc)
            return a2, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:50s} {ms:9.2f} ms")
    return ms


def dep(x, acc):
    return x + (jnp.sin(acc) * 1e-20).astype(x.dtype)


def main():
    which = set(sys.argv[1:])

    def want(nm):
        return not which or nm in which

    if want("transpose"):
        def tr(args, acc):
            a8, a16 = args
            t1 = dep(a8, acc).T  # [8, K]
            t2 = a16.T
            # consume in a transpose-sensitive way (first column slice)
            return args, jnp.sum(t1[:, :128]) + jnp.sum(
                t2[:, :128].astype(jnp.float32))
        timeit("transpose [2M,8]f32+[2M,16]bf16 (sliced use)", tr, (A8, A16))

        def tr2(args, acc):
            a8, a16 = args
            t1 = dep(a8, acc).T + 0.0
            t2 = a16.T + jnp.bfloat16(0)
            return args, t1[0, 0] + t2[0, 0].astype(jnp.float32)
        timeit("transpose materialized (asarray)", tr2, (A8, A16))

    if want("copy"):
        def cp(args, acc):
            (a8,) = args
            b = dep(a8, acc) + 1.0
            return args, b[0, 0]
        timeit("copy [2M,8] f32 (control)", cp, (A8,))

    if want("binning"):
        from vegs_tpu.ops import binning as B
        grid = B.TileGrid.for_image(376, 1408)
        slot = jnp.arange(K, dtype=jnp.int32)

        def ss_sort(args, acc):
            cum, = args
            g = jnp.searchsorted(cum + (acc * 1e-20).astype(jnp.int32), slot,
                                 side="right", method="sort")
            return args, jnp.sum(g[:1]).astype(jnp.float32)
        timeit("binning: searchsorted slots->cum (sort)", ss_sort, (CUM,))

        rec = jnp.asarray(rng.integers(0, 1 << 12, (N, 8)).astype(np.int32))

        def rec_gather(args, acc):
            rec, gidx = args
            out = rec[gidx]
            return args, jnp.sum(out[0]).astype(jnp.float32)
        timeit("binning: rec row-8 int32 gather [2M]", rec_gather,
               (rec, GIDX_RAND))

        key = jnp.asarray(rng.integers(0, 1 << 30, K).astype(np.int32))

        def sortpairs(args, acc):
            key, gidx = args
            ks, gs = jax.lax.sort((dep_i(key, acc), gidx), num_keys=1)
            return args, jnp.sum(ks[:1]).astype(jnp.float32)
        timeit("binning: lax.sort pairs [2M]", sortpairs, (key, GIDX_RAND))

        packed = jnp.asarray(rng.integers(0, 1 << 20, (K, 2)).astype(np.int32))
        src = jnp.asarray(rng.permutation(K).astype(np.int32))

        def relayout(args, acc):
            packed, src = args
            out = packed[src]
            return args, jnp.sum(out[0]).astype(jnp.float32)
        timeit("binning: relayout row-2 int32 gather [2M]", relayout,
               (packed, src))

        def full(args, acc):
            m2d, d, r = args
            b = B.bin_gaussians(dep(m2d, acc), d, r, grid, K)
            return args, jnp.sum(b.gidx).astype(jnp.float32)

        m2d = jnp.asarray(np.stack([
            rng.uniform(0, 1408, N), rng.uniform(0, 376, N)], 1).astype(np.float32))
        dpt = jnp.asarray(rng.uniform(2, 60, N).astype(np.float32))
        rad = jnp.asarray(rng.integers(1, 9, N).astype(np.int32))
        timeit("binning: full bin_gaussians", full, (m2d, dpt, rad))


def dep_i(x, acc):
    return x + (acc * 1e-20).astype(x.dtype)


if __name__ == "__main__":
    main()
