"""Micro-split of gather_expand's backward at bench scale (K=1.5M, n=500k):
which of (reorder gathers, blocked cumsum, boundary gather) dominates the
~50 ms, and what do the candidate replacements cost?
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

from vegs_tpu.ops.rasterize import _blocked_cumsum, _gather3x8, _gather_rows_aux

K = 1 << 21
N = 500_000


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
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


def dep(x, acc):
    return x + (jnp.sin(acc) * 1e-20).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    order = jnp.asarray(rng.permutation(K + 8)[:K].astype(np.int32))
    d_pf = jnp.asarray(rng.normal(size=(K, 8)).astype(np.float32))
    d_pa = jnp.asarray(
        rng.normal(size=(K, 16)).astype(np.float32)).astype(jnp.bfloat16)
    ends = jnp.sort(jnp.asarray(rng.integers(0, K, N + 1).astype(np.int32)))
    cum24 = jnp.asarray(rng.normal(size=(K + 1, 24)).astype(np.float32))
    g24 = jnp.asarray(rng.normal(size=(K, 24)).astype(np.float32))

    timeit("reorder gather f32 row-8 [K]", lambda a, acc: jnp.sum(
        jnp.pad(dep(a[0], acc), ((0, 8), (0, 0)))[a[1]]), (d_pf, order))
    timeit("reorder gather bf16-as-int32 row-8 [K]", lambda a, acc: jnp.sum(
        _gather_rows_aux(jnp.pad(dep(a[0], acc), ((0, 8), (0, 0))),
                         a[1]).astype(jnp.float32)), (d_pa, order))
    timeit("blocked cumsum [K,24] f32", lambda a, acc: jnp.sum(
        _blocked_cumsum(dep(a[0], acc))), (g24,))
    timeit("boundary gather3x8 [N] of [K+1,24]", lambda a, acc: jnp.sum(
        _gather3x8(dep(a[0], acc), a[1])), (cum24, ends))

    # candidate: fused bf16 cotangent tables -> ONE row-8 int32 gather of
    # 32B rows carrying 16 bf16 cols (d_pf cast down) + second table dropped
    d_all16 = jnp.concatenate(
        [d_pf.astype(jnp.bfloat16), d_pa[:, :8]], axis=1)  # [K, 16] bf16
    timeit("fused bf16 gather row-8-int32 (16 cols) [K]", lambda a, acc: jnp.sum(
        _gather_rows_aux(jnp.pad(dep(a[0], acc), ((0, 8), (0, 0))),
                         a[1]).astype(jnp.float32)), (d_all16, order))

    # candidate: boundary gather from bf16 cumsum (rows 48B -> 24B x2)
    cum12a = cum24[:, :12].astype(jnp.bfloat16)
    timeit("boundary gather [N] rows-12-bf16 (as 6xint32)",
           lambda a, acc: jnp.sum(jax.lax.bitcast_convert_type(
               jax.lax.bitcast_convert_type(
                   dep(a[0], acc).reshape(K + 1, 6, 2), jnp.int32)[a[1]],
               jnp.bfloat16).astype(jnp.float32)), (cum12a, ends))

    # candidate: one-shot [K,24] gather (current alternative shape)
    timeit("reorder gather f32 row-24 [K] (3x8 pieces)", lambda a, acc: jnp.sum(
        _gather3x8(jnp.pad(dep(a[0], acc), ((0, 8), (0, 0))), a[1])),
        (g24, order))

    # candidate: unique-indices scatter instead of sort for `order` inversion
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, K, K).astype(np.int32))
    timeit("perm-invert via 2-op sort [K]", lambda a, acc: jnp.sum(
        jax.lax.sort((a[0], depi(a[1], acc)), num_keys=1)[1]), (perm, vals))
    timeit("perm-invert via unique scatter [K]", lambda a, acc: jnp.sum(
        jnp.zeros((K,), jnp.int32).at[a[0]].set(
            depi(a[1], acc), unique_indices=True)), (perm, vals))


def depi(x, acc):
    return x + (acc.astype(jnp.int32) & 1)


if __name__ == "__main__":
    main()
