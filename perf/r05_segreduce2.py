"""Measure the CHANNEL-MAJOR Pallas segment-reduce at the bench shape, plus
the full candidate _ge_bwd composition:
  blend cotangents [8,K] f32 / [16,K] bf16 (channel-major, as the blend bwd
  kernel emits them) -> pack row-major [K,16] int32 -> masked fused gather by
  `order` -> unpack/upcast + transpose to [24, K] f32 -> segment_reduce_cols
  -> [24, NG] -> slice + transpose out.
Current XLA path for reference: 25.1 ms (r05_gebwd2.py)."""

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

from vegs_tpu.ops.segreduce import GB, segment_reduce_cols

K = 1126912
N1 = 500_001
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


def dep(x, acc):
    return x + (jnp.sin(acc) * 1e-20).astype(x.dtype)


def unpack_to_cm(g16, k):
    """[K,16] int32 (8 f32-bitcast + 8 bf16-pair) -> [24, K] f32 channel-major
    with aux re-interleaved into original column order."""
    gT = g16.T                                   # [16, K]
    g_f = jax.lax.bitcast_convert_type(gT[:8], jnp.float32)
    aux = gT[8:]
    lo = jax.lax.bitcast_convert_type(jax.lax.shift_left(aux, 16), jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(aux, jnp.int32(-65536)), jnp.float32)
    inter = jnp.stack([lo, hi], axis=1).reshape(16, k)
    return jnp.concatenate([g_f, inter], axis=0)


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
    cols = jnp.asarray(rng.normal(size=(24, K)).astype(np.float32))

    def seg_only(a, acc):
        c, s, e = a
        out = segment_reduce_cols(dep(c, acc), s, e)
        return jnp.sum(out)
    timeit("Pallas segment_reduce_cols alone", seg_only,
           (cols, starts, ends))

    def full_new(a, acc):
        pft, pat, idx, s, e = a
        pft = dep(pft, acc)
        p = jnp.concatenate(
            [jax.lax.bitcast_convert_type(pft.T, jnp.int32),
             jax.lax.bitcast_convert_type(pat.T.reshape(K, 8, 2), jnp.int32)],
            axis=1)
        dead = (idx >= K)[:, None]
        g = jnp.where(dead, 0, p[jnp.where(dead[:, 0], 0, idx)])
        out = segment_reduce_cols(unpack_to_cm(g, K), s, e)  # [24, NG]
        d_pf = out[:8, :N1].T
        d_pa = out[8:, :N1].T.astype(jnp.bfloat16)
        return jnp.sum(d_pf) + jnp.sum(d_pa.astype(jnp.float32))
    timeit("FULL new _ge_bwd (pack+gather+unpackT+segreduce)", full_new,
           (d_pf_t, d_pa_t, order, starts, ends))


if __name__ == "__main__":
    main()
