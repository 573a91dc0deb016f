"""Speed-of-light accounting for the rasterizer fwd+bwd step (round-4
verdict weak item 5: BASELINE's north star is "fwd+bwd at speed-of-light
per chip", but NOTES_PERF never stated the roofline).

For each pipeline stage: ideal HBM bytes/step (the minimum traffic the
algorithm must move at its static shapes), ideal FLOPs/step where they
could bind, the implied speed-of-light time t_SoL = max(bytes/BW,
flops/peak), and %SoL = t_SoL / t_measured. Peaks: TPU v5e ~819 GB/s HBM,
~197 bf16 TFLOP/s (394 with int8, n/a here), ~49 f32 TFLOP/s.

Measured times are pasted from perf/r09_refscale.py runs (same scene,
same auto-sized caps); edit MEASURED below when re-running. The sort is
reported against its measured primitive cost (XLA's multi-pass sort has
no closed-form single-pass bound worth pretending to).

Run: python perf/r10_roofline.py   (pure arithmetic, no TPU needed)
"""

HBM = 819e9          # bytes/s
F32_PEAK = 49e12     # FLOP/s (MXU f32)
BF16_PEAK = 197e12

H, W = 376, 1408
P = H * W


def fmt(n):
    for u, s in (("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(n) >= s:
            return f"{n / s:.2f} {u}"
    return f"{n:.0f}"


def stage_table(label, n, k_cap, k_pad, k_sat, kept_walk, measured):
    """measured: dict stage -> ms (from r09_refscale at these caps)."""
    rows = []

    def add(stage, rd, wr, flops, peak, note=""):
        t_mem = (rd + wr) / HBM
        t_flop = flops / peak if flops else 0.0
        t_sol = max(t_mem, t_flop) * 1e3
        ms = measured.get(stage)
        pct = (100 * t_sol / ms) if ms else None
        rows.append((stage, rd + wr, flops, t_sol, ms, pct, note))

    # project fwd+bwd: params read x2 (fwd+bwd), grads written, proj
    # outputs + cotangents. Dominated by the SH table (192 B read fwd,
    # re-read bwd, 192 B grad write).
    par = 12 + 16 + 12 + 4 + 192          # means/quat/scale/op/sh
    outs = 8 + 4 + 12 + 8 + 12 + 4 + 8    # proj fields
    add("project fwd+bwd", n * (2 * par + outs), n * (par + outs),
        n * 900, F32_PEAK, "SH d3 eval+grad ~900 flop")

    # bin_raw: rec build (n x 32 W), rec gather (k x 32 R random), key
    # write + sort3 measured separately; slot-map scatter/cumsum ~3 passes
    # of 4 B over k.
    add("bin_raw minus sort", n * 32 + k_cap * 32 + k_cap * 4 * 6,
        k_cap * 4 * 5, 0, F32_PEAK, "rec gather + slot-map passes")
    add("sort3 (measured primitive)", 0, 0, 0, F32_PEAK,
        "XLA multi-pass sort; see primitive table")

    # satcull prepass: pay_f32 row gather in sorted order + kernel walk
    # (walks kept_walk instances at 32 B + pixel-state in VMEM).
    add("satcull prepass gather", k_cap * 32 + k_cap * 32, 0, 0, F32_PEAK)
    add("satcount kernel", kept_walk * 32, 0,
        kept_walk * 256 * 2 * 6, F32_PEAK, "walks saturation prefix only")

    # relayout + order map: row-2 pull at k_sat, dest cumsums (3x) at
    # k_cap, permutation sort measured inside binning.
    add("relayout+order (minus sorts)",
        k_sat * 8 + k_cap * 4 * 6, k_sat * 8 + k_cap * 4 * 3, 0, F32_PEAK)

    # gather_expand fwd: fused 64-B row gather at k_sat + write.
    add("gather_expand fwd", k_sat * 64 + n * 64, k_sat * 64, 0, F32_PEAK)

    # blend fwd+bwd: payload DMA 64 B per WALKED instance (x2: fwd + bwd
    # sweep), grad writes 64 B (f32 8 + bf16 16), pixel blocks; MXU: per
    # chunk [P=256,6]x[6,C] + [C,C] prefix + [P,C]x[C,11].
    mxu = kept_walk * (256 * 6 * 2 + 256 * 2 + 256 * 11 * 2) * 2
    add("blend fwd+bwd", kept_walk * 64 * 2 + P * 12 * 4 * 3,
        k_pad * 64 + P * 12 * 4, mxu, F32_PEAK)

    # backward reduce: cotangent row gather at compact size + segreduce
    # (membership matmul: every row contracts against its 512-Gaussian
    # block over 24 channels).
    add("cotangent gather + segreduce",
        k_sat * 64 + k_sat * 96, n * 96,
        k_sat * 512 * 24 * 2, BF16_PEAK)

    print(f"\n## {label} (n={n}, k_cap={k_cap}, k_pad={k_pad}, "
          f"walked~{kept_walk})")
    print("| stage | ideal bytes | ideal FLOPs | t_SoL (ms) | measured "
          "(ms) | %SoL | note |")
    print("|---|---|---|---|---|---|---|")
    tot_sol = tot_ms = 0.0
    for stage, b, f, sol, ms, pct, note in rows:
        tot_sol += sol
        tot_ms += ms or 0
        print(f"| {stage} | {fmt(b)}B | {fmt(f) if f else '-'} | "
              f"{sol:.2f} | {ms if ms is not None else '-'} | "
              f"{f'{pct:.0f}%' if pct else '-'} | {note} |")
    print(f"| **total** | | | **{tot_sol:.2f}** | **{tot_ms:.1f}** | "
          f"**{100 * tot_sol / tot_ms:.0f}%** | + sort + glue |")
    print(f"SoL throughput bound: {P / tot_sol / 1e3:.1f} Mpix/s; "
          f"measured full step: see r09 'full fwd+bwd'.")


# ---- 2.23M reference scale (perf/r09_refscale.py, 2026-08-21, satcull
# pipeline: full fwd+bwd 206.6 ms = 2.56 Mpix/s; satcull keeps 838k of
# 4.03M real instances; the prepass gather row was since replaced by six
# sort-carried operands (~2 ms) — see NOTES_PERF round-5)
MEASURED_2M = {
    "project fwd+bwd": 18.65,
    "bin_raw minus sort": 64.58 - 9.53,
    "sort3 (measured primitive)": 9.53,
    "satcull prepass gather": 22.88,
    "satcount kernel": 4.36,
    "relayout+order (minus sorts)": 72.93 - 64.58,
    "gather_expand fwd": 16.38,
    "blend fwd+bwd": 12.50,
    "cotangent gather + segreduce": 39.60 - 16.38,
}

if __name__ == "__main__":
    meas = {k: v for k, v in MEASURED_2M.items() if v is not None}
    stage_table("2.23M reference scale", 2_233_571,
                4_867_584, 1_158_656, 1_158_656, 1_100_000, meas)
