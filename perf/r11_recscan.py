"""Micro A/B for replacing bin_raw's rec row-8 gather with a run-delta
scatter + blocked row-cumsum (round-5).

The slot->Gaussian rec expansion is piecewise-constant along slots, so the
[k_cap, 8] random row gather (~25 ms at 4.87M) could become: per-Gaussian
int32 row DELTAS (wrapping arithmetic reconstructs bitcast f32 exactly)
sorted by run start (reusing the existing slot-map sort, widened), one
row scatter at run starts, one [k_cap, 8] blocked cumsum. Decision inputs:

  1. wide-sort cost over n (the existing 2-op slot-map sort must carry 8
     more operands),
  2. [k_cap, 8] int32 row scatter at sorted unique indices,
  3. [k_cap, 8] blocked cumsum,
  vs the measured row-8 gather at k_cap.

Run on TPU: python perf/r11_recscan.py
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

N = 2_233_571
K = 4_867_584


def timeit(name, fn, args, iters=6):
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
    print(f"{name:56s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**30, N, dtype=np.int32))
    vals = jnp.asarray(np.arange(N, dtype=np.int32))
    rec = jnp.asarray(rng.integers(-2**30, 2**30, (N, 8), dtype=np.int32))
    # sorted, unique scatter targets (run starts): ~N of them over [0, K)
    starts = jnp.asarray(np.sort(rng.choice(K, N, replace=False))
                         .astype(np.int32))
    gidx = jnp.asarray(np.sort(rng.integers(0, N, K)).astype(np.int32))

    def dep_i(x, acc):
        return x + (acc * 1e-20).astype(x.dtype)

    def sort2(args, acc):
        k, v = args
        ks, vs = jax.lax.sort((dep_i(k, acc), v), num_keys=1)
        return args, jnp.sum(ks).astype(jnp.float32) * 1e-9
    timeit(f"sort 2-op over n={N}", sort2, (keys, vals))

    def sort10(args, acc):
        k, v, r = args
        outs = jax.lax.sort(
            (dep_i(k, acc), v) + tuple(r[:, i] for i in range(8)),
            num_keys=1)
        return args, jnp.sum(outs[0]).astype(jnp.float32) * 1e-9
    timeit(f"sort 10-op over n={N}", sort10, (keys, vals, rec))

    def scatter_rows(args, acc):
        s, r = args
        z = jnp.zeros((K, 8), jnp.int32).at[dep_i(s, acc)].add(
            r, mode="drop", unique_indices=True, indices_are_sorted=True)
        return args, jnp.sum(z).astype(jnp.float32) * 1e-9
    timeit(f"row-8 scatter n->k at sorted unique idx", scatter_rows,
           (starts, rec))

    def row_cumsum(args, acc):
        (z,) = args
        zb = dep_i(z, acc).reshape(K // 512, 512, 8)
        inner = jnp.cumsum(zb, axis=1)
        tot = inner[:, -1]
        prefix = jnp.cumsum(tot, axis=0) - tot
        out = (inner + prefix[:, None, :]).reshape(K, 8)
        return args, jnp.sum(out).astype(jnp.float32) * 1e-9
    z0 = jnp.zeros((K, 8), jnp.int32)
    timeit(f"[{K}, 8] int32 blocked cumsum", row_cumsum, (z0,))

    def row_gather(args, acc):
        (r, g) = args
        out = dep_i(r, acc)[g]
        return args, jnp.sum(out).astype(jnp.float32) * 1e-9
    timeit(f"row-8 gather [n]->[k={K}] (current rec path)", row_gather,
           (rec, gidx))


if __name__ == "__main__":
    main()
