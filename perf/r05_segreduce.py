"""Measure the Pallas segment-reduce kernel at the bench workload shape and
the full candidate _ge_bwd composition (transpose + pack + fused gather +
segreduce), vs the current XLA path (see r05_gebwd2.py for its 25.1 ms)."""

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

from vegs_tpu.ops.segreduce import GB, segment_reduce_rows

K = 1126912
N1 = 500_001                    # n + dummy
NG = (N1 + GB - 1) // GB * GB


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


def depi(x, acc):
    return x + (acc.astype(jnp.int32) & 1)


def main():
    rng = np.random.default_rng(0)
    order = jnp.asarray(rng.permutation(K).astype(np.int32))
    d_pf_t = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    d_pa_t = jnp.asarray(
        rng.normal(size=(16, K)).astype(np.float32)).astype(jnp.bfloat16)
    ends_r = np.sort(rng.integers(0, K, N1)).astype(np.int32)
    ends = jnp.asarray(np.concatenate(
        [ends_r, np.full(NG - N1, ends_r[-1], np.int32)]))
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    packed = jnp.asarray(rng.integers(-2**31, 2**31, (K, 16)).astype(np.int64)
                         ).astype(jnp.int32)

    def seg_only(a, acc):
        p, s, e = a
        out = segment_reduce_rows(depi(p, acc), s, e)
        return jnp.sum(out)
    timeit("Pallas segment_reduce_rows alone", seg_only,
           (packed, starts, ends))

    def full_new(a, acc):
        pft, pat, idx, s, e = a
        pft = pft + (jnp.sin(acc) * 1e-20).astype(pft.dtype)
        p = jnp.concatenate(
            [jax.lax.bitcast_convert_type(pft.T, jnp.int32),
             jax.lax.bitcast_convert_type(pat.T.reshape(K, 8, 2), jnp.int32)],
            axis=1)
        dead = (idx >= K)[:, None]
        g = jnp.where(dead, 0, p[jnp.where(dead[:, 0], 0, idx)])
        out = segment_reduce_rows(g, s, e)
        d_rows = out[:N1]
        return jnp.sum(d_rows[:, :8]) + jnp.sum(
            d_rows[:, 8:].astype(jnp.bfloat16).astype(jnp.float32))
    timeit("FULL new _ge_bwd (transp+pack+gather+segreduce)", full_new,
           (d_pf_t, d_pa_t, order, starts, ends))


if __name__ == "__main__":
    main()
