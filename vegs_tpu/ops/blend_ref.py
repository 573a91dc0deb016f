"""Reference alpha-compositing implementations — the semantic spec.

The reference's CUDA blend kernel is not vendored (empty submodule), so THIS
FILE is the single source of truth for compositing semantics (SURVEY.md §7.3
item 4). Two implementations:

  * `blend_loop_np` — explicit Python loops, trusted by inspection. Matches
    the upstream 3DGS forward exactly (alpha clamp 0.99, skip power > 0, skip
    alpha < 1/255, stop when T would drop below 1e-4), extended with the
    VEGS fork's extra composited channels (depth/quat/scale) using the same
    weights (SURVEY.md §2.3 item 1).
  * `blend_dense` — the same algorithm as one dense vectorized JAX pass
    (O(K · H · W), small scenes only). Differentiable; its autodiff gradients
    are the oracle for the Pallas backward kernel.

Compositing spec (per pixel p in tile t, instances i in (tile,depth)-sorted
order restricted to tile t):
    power_i = -0.5*(a_i dx^2 + c_i dy^2) - b_i dx dy,  d = p - mean2d_i
    skip if power_i > 0
    alpha_i = min(0.99, op_i * exp(power_i));  skip if alpha_i < 1/255
    stop before including i if T * (1 - alpha_i) < 1e-4
    out_c += payload_c,i * alpha_i * T;  T *= (1 - alpha_i)
Pixel coordinates are integer (pixel p has coordinates (x, y) exactly, no +0.5
offset), matching the CUDA rasterizer's pixf convention.

Payload row layout (PAYLOAD_ROWS = 17):
    0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
    6..8 rgb, 9 depth, 10..13 quat(wxyz), 14..16 scale
Output channel layout (OUT_CHANNELS = 12):
    0..10 = accumulated payload rows 6..16, 11 = final transmittance T.
Background is NOT composited here — callers blend `rgb + T * bg` outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .binning import TileGrid

PAYLOAD_ROWS = 17
OUT_CHANNELS = 12
N_ACCUM = 11  # payload rows 6..16 are accumulated

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def blend_loop_np(
    payload_sorted: np.ndarray,  # [17, K]
    sort_keys: np.ndarray,       # [K] packed (tile << 19 | depth) keys
    tile_starts: np.ndarray,     # [T+1]
    grid: TileGrid,
    height: int,
    width: int,
) -> np.ndarray:
    """Trusted loop implementation. Returns [12, height, width]."""
    out = np.zeros((OUT_CHANNELS, height, width), np.float64)
    pay = np.asarray(payload_sorted, np.float64)
    for ty in range(grid.nty):
        for tx in range(grid.ntx):
            t = ty * grid.ntx + tx
            s, e = int(tile_starts[t]), int(tile_starts[t + 1])
            for py in range(ty * grid.tile_h, min((ty + 1) * grid.tile_h, height)):
                for px in range(tx * grid.tile_w, min((tx + 1) * grid.tile_w, width)):
                    T = 1.0
                    acc = np.zeros(N_ACCUM)
                    for k in range(s, e):
                        mx, my, a, b, c, op = pay[:6, k]
                        dx, dy = px - mx, py - my
                        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                        if power > 0:
                            continue
                        alpha = min(ALPHA_CLAMP, op * np.exp(power))
                        if alpha < ALPHA_MIN:
                            continue
                        test_T = T * (1 - alpha)
                        if test_T < T_EPS:
                            break
                        acc += pay[6:, k] * alpha * T
                        T = test_T
                    out[:N_ACCUM, py, px] = acc
                    out[N_ACCUM, py, px] = T
    return out.astype(np.float32)


def blend_dense(
    payload_sorted: jax.Array,  # [17, K]
    sort_keys: jax.Array,       # [K] packed keys (sentinel for padding)
    tile_starts: jax.Array,     # unused (membership from keys); kept for API parity
    grid: TileGrid,
    height: int,
    width: int,
) -> jax.Array:
    """Dense vectorized spec implementation. Returns [12, height, width].

    Differentiable w.r.t. payload_sorted. O(K * H * W): tests only.
    """
    k = payload_sorted.shape[1]
    inst_tile = jax.lax.shift_right_logical(sort_keys, grid.tile_shift)  # [K]

    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    pix_tile = (ys // grid.tile_h) * grid.ntx + (xs // grid.tile_w)  # [H, W]
    px = xs.reshape(-1).astype(payload_sorted.dtype)  # [P]
    py = ys.reshape(-1).astype(payload_sorted.dtype)
    ptile = pix_tile.reshape(-1)  # [P]

    mx, my, a, b, c, op = [payload_sorted[i][:, None] for i in range(6)]  # [K,1]
    dx = px[None, :] - mx  # [K, P]
    dy = py[None, :] - my
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    member = inst_tile[:, None] == ptile[None, :]  # [K, P]
    # exp clamped at 0: invalid (power > 0) instances would overflow to inf
    # and turn their masked-out gradients into NaN (matches blend_pallas).
    alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
    valid = member & (power <= 0) & (alpha_raw >= ALPHA_MIN)
    alpha = jnp.where(valid, jnp.minimum(alpha_raw, ALPHA_CLAMP), 0.0)

    # First pass: transmittance trajectory to locate the stopping instance.
    L = jnp.log1p(-alpha)
    logT = jnp.cumsum(L, axis=0) - L  # exclusive
    T = jnp.exp(logT)
    crossing = (T * (1.0 - alpha) < T_EPS) & (alpha > 0)
    crossed_before = (jnp.cumsum(crossing.astype(payload_sorted.dtype), axis=0)
                      - crossing.astype(payload_sorted.dtype)) > 0
    include = valid & ~crossed_before & ~crossing

    # Second pass with the final inclusion set (exact CUDA T trajectory).
    alpha_inc = jnp.where(include, alpha, 0.0)
    Li = jnp.log1p(-alpha_inc)
    logTi = jnp.cumsum(Li, axis=0) - Li
    Ti = jnp.exp(logTi)
    w = alpha_inc * Ti  # [K, P]

    acc = payload_sorted[6:] @ w  # [11, P]
    t_fin = jnp.exp(jnp.sum(Li, axis=0))  # [P]
    out = jnp.concatenate([acc, t_fin[None, :]], axis=0)
    return out.reshape(OUT_CHANNELS, height, width)
