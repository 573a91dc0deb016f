"""Round-3 micro batch: gather_expand backward rework candidates at the real
bench shape (K = 1126912 slots, n = 500k Gaussians).

Questions:
  1. Does ONE fused [K,16]-int32 row gather (64 B rows: 8 f32 cotangent cols
     bitcast + 16 bf16 cols bitcast) beat the current two row-8 gathers?
  2. What do the [8,K] <-> [K,8] / [16,K] <-> [K,16] transposes around the
     blend kernel cost?
  3. What does the current XLA segment path (blocked cumsum + boundary
     gather + diff) cost in isolation, as the target for the Pallas
     segment-reduce kernel?
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

from vegs_tpu.ops.rasterize import _blocked_cumsum, _gather_rows_aux

K = 1126912          # bench k_cap (auto-sized)
N = 500_001          # n + dummy row


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


def depi(x, acc):
    return x + (acc.astype(jnp.int32) & 1)


def main():
    rng = np.random.default_rng(0)
    order = jnp.asarray(rng.permutation(K).astype(np.int32))
    d_pf = jnp.asarray(rng.normal(size=(K, 8)).astype(np.float32))
    d_pa = jnp.asarray(
        rng.normal(size=(K, 16)).astype(np.float32)).astype(jnp.bfloat16)
    d_pf_t = d_pf.T                                 # [8, K] channel-major
    d_pa_t = d_pa.T                                 # [16, K]
    packed = jnp.concatenate(
        [jax.lax.bitcast_convert_type(d_pf, jnp.int32),
         jax.lax.bitcast_convert_type(d_pa.reshape(K, 8, 2), jnp.int32)],
        axis=1)                                     # [K, 16] int32
    ends = jnp.sort(jnp.asarray(
        rng.integers(0, K, N).astype(np.int32)))

    # 1. current: two separate reorder gathers
    def two_gathers(a, acc):
        pf, pa, idx = a
        g_f = dep(pf, acc)[idx]
        g_a = _gather_rows_aux(pa, idx).astype(jnp.float32) + acc * 1e-20
        return jnp.sum(g_f) + jnp.sum(g_a)
    timeit("two gathers: f32 row-8 + bf16-as-int32 row-8", two_gathers,
           (d_pf, d_pa, order))

    # 2. fused single [K, 16] int32 row gather (64 B rows)
    def one_gather(a, acc):
        p, idx = a
        g = depi(p, acc)[idx]
        return jnp.sum(g).astype(jnp.float32)
    timeit("ONE fused [K,16]-int32 row gather (64 B rows)", one_gather,
           (packed, order))

    # 2b. fused gather INCLUDING the pack (bitcasts+concat) from [K,8]/[K,16]
    def pack_and_gather(a, acc):
        pf, pa, idx = a
        p = jnp.concatenate(
            [jax.lax.bitcast_convert_type(dep(pf, acc), jnp.int32),
             jax.lax.bitcast_convert_type(pa.reshape(K, 8, 2), jnp.int32)],
            axis=1)
        return jnp.sum(p[idx]).astype(jnp.float32)
    timeit("pack (bitcast+concat) + fused gather", pack_and_gather,
           (d_pf, d_pa, order))

    # 2c. pack from CHANNEL-MAJOR blend outputs (transposes included)
    def pack_t_and_gather(a, acc):
        pft, pat, idx = a
        p = jnp.concatenate(
            [jax.lax.bitcast_convert_type(dep(pft, acc).T, jnp.int32),
             jax.lax.bitcast_convert_type(pat.T.reshape(K, 8, 2), jnp.int32)],
            axis=1)
        return jnp.sum(p[idx]).astype(jnp.float32)
    timeit("transpose [8,K]+[16,K] + pack + fused gather", pack_t_and_gather,
           (d_pf_t, d_pa_t, order))

    # 3. transposes alone
    timeit("transpose [8,K] f32 -> [K,8]",
           lambda a, acc: jnp.sum(dep(a[0], acc).T * a[1]), (d_pf_t, d_pf))
    timeit("transpose [16,K] bf16 -> [K,16]",
           lambda a, acc: jnp.sum((dep(a[0], acc).T * a[1]).astype(jnp.float32)),
           (d_pa_t, d_pa))
    timeit("transpose [K,8] f32 -> [8,K] (fwd side)",
           lambda a, acc: jnp.sum(dep(a[0], acc).T * a[1]), (d_pf, d_pf_t))

    # 4. current XLA segment path: cumsum + boundary gather + diff
    def seg_xla(a, acc):
        g_f, g_a, e = a
        g_f = dep(g_f, acc)
        cum_f = _blocked_cumsum(g_f)
        cum_a = _blocked_cumsum(g_a.astype(jnp.float32))
        e_idx = jnp.maximum(e - 1, 0)
        nonempty = (e > 0).astype(jnp.float32)[:, None]
        Cf = cum_f[e_idx] * nonempty
        Ca = jnp.concatenate(
            [cum_a[:, :8][e_idx], cum_a[:, 8:][e_idx]], axis=1) * nonempty
        C = jnp.concatenate([Cf, Ca], axis=1)
        d_rows = C - jnp.concatenate(
            [jnp.zeros((1, 24), C.dtype), C[:-1]], axis=0)
        return jnp.sum(d_rows)
    timeit("XLA segment path (cumsum + boundary gather + diff)", seg_xla,
           (d_pf, d_pa, ends))

    # 5. full current _ge_bwd equivalent (gathers + mask + segment path)
    def full_current(a, acc):
        pf, pa, idx, e = a
        pf = dep(pf, acc)
        dead = (idx >= K)[:, None]
        idx_c = jnp.where(dead[:, 0], 0, idx)
        g_f = jnp.where(dead, 0.0, pf[idx_c])
        g_a = jnp.where(dead, 0.0,
                        _gather_rows_aux(pa, idx_c).astype(jnp.float32))
        cum_f = _blocked_cumsum(g_f)
        cum_a = _blocked_cumsum(g_a)
        e_idx = jnp.maximum(e - 1, 0)
        nonempty = (e > 0).astype(jnp.float32)[:, None]
        Cf = cum_f[e_idx] * nonempty
        Ca = jnp.concatenate(
            [cum_a[:, :8][e_idx], cum_a[:, 8:][e_idx]], axis=1) * nonempty
        C = jnp.concatenate([Cf, Ca], axis=1)
        d_rows = C - jnp.concatenate(
            [jnp.zeros((1, 24), C.dtype), C[:-1]], axis=0)
        return jnp.sum(d_rows)
    timeit("FULL current _ge_bwd (gathers+mask+segment)", full_current,
           (d_pf, d_pa, order, ends))


if __name__ == "__main__":
    main()
