"""Second micro batch: real costs of the searchsorted calls and sorts in
binning/_ge_fwd, and of the boundary-delta replacement for slot->gaussian."""

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


def depi(x, acc):
    return x + (acc.astype(jnp.int32) & 1)


def main():
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, K, K).astype(np.int32))
    cumN = jnp.asarray(np.sort(rng.integers(0, K, N)).astype(np.int32))
    gidxK = jnp.asarray(np.sort(rng.integers(0, N, K)).astype(np.int32))
    slot = jnp.arange(K, dtype=jnp.int32)
    arangeN = jnp.arange(N, dtype=jnp.int32)

    # binning's slot->gaussian: searchsorted(cum[N], slot[K], right, 'sort')
    def ss1(a, acc):
        c = depi(a[0], acc)
        r = jnp.searchsorted(c, slot, side="right", method="sort")
        return jnp.sum(r).astype(jnp.float32)
    timeit("searchsorted(cum[N], slot[K]) 'sort'", ss1, (cumN,))

    # _ge_fwd's ends: searchsorted(gidx_sorted[K], arange[N], right, 'sort')
    def ss2(a, acc):
        g = depi(a[0], acc)
        r = jnp.searchsorted(g, arangeN, side="right", method="sort")
        return jnp.sum(r).astype(jnp.float32)
    timeit("searchsorted(gidx_s[K], arange[N]) 'sort'", ss2, (gidxK,))

    # sorts
    def sort2(a, acc):
        k = depi(a[0], acc)
        ks, vs = jax.lax.sort((k, perm), num_keys=1)
        return (jnp.sum(ks) + jnp.sum(vs)).astype(jnp.float32)
    timeit("lax.sort 2-operand [K]", sort2, (vals,))

    def sort3(a, acc):
        k = depi(a[0], acc)
        ks, vs, ws = jax.lax.sort((k, perm, slot), num_keys=1)
        return (jnp.sum(ks) + jnp.sum(vs) + jnp.sum(ws)).astype(jnp.float32)
    timeit("lax.sort 3-operand [K]", sort3, (vals,))

    # boundary-delta slot->gaussian replacement:
    # scatter deltas at N sorted-unique positions + 1 cumsum over K
    posN = jnp.asarray(np.sort(rng.choice(K, N, replace=False)).astype(np.int32))
    deltaN = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))

    def bdelta(a, acc):
        d = depi(a[0], acc)
        z = jnp.zeros((K,), jnp.int32).at[posN].add(
            d, unique_indices=True, indices_are_sorted=True, mode="drop")
        zb = z.reshape(K // 512, 512)
        inner = jnp.cumsum(zb, axis=1)
        tot = inner[:, -1]
        prefix = jnp.cumsum(tot) - tot
        return jnp.sum(inner + prefix[:, None]).astype(jnp.float32)
    timeit("boundary-delta scatter[N]+cumsum[K]", bdelta, (deltaN,))

    # bf16 row-16 gather (payload aux fwd)
    tbl16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32)).astype(jnp.bfloat16)
    gidx = jnp.asarray(rng.integers(0, N, K).astype(np.int32))

    def recg16(a, acc):
        t = a[0] + (jnp.sin(acc) * 1e-20).astype(jnp.bfloat16)
        return jnp.sum(t[gidx].astype(jnp.float32))
    timeit("bf16 row16 gather K rows from [N,16]", recg16, (tbl16,))


if __name__ == "__main__":
    main()
