"""Segment-reduction kernels tuned for TPU.

`jax.ops.segment_sum` lowers to scatter-add, which serializes on TPU
(~8 ms for a 0.8 MPix image on v5e). For the fusion workload the segment
count P is often small (mesh faces), so the reduction is re-expressed as a
chunked one-hot matmul on the MXU:

    seg[p, c] = sum_px 1[idx_px == p] * data[px, c]
             == (onehot(idx) ^T @ data)[p, c]

which runs at MXU speed (~1 ms for the same image). For large P (texel mode
can reach millions of primitives) the one-hot matrix would be too large, so
the scatter path is kept; the dispatch threshold is SEGMENT_MXU_MAX_P.

The weight-mix trick that makes a single pass sufficient lives in
fusion/_distributed: every aggregator's contribution is linear in the
per-pixel weight, so pixels-per-face normalization is applied to the
segmented sums instead of per pixel (bit-compatible up to fp reassociation).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

import os

# Measured crossover on v5e (0.8 MPix, 20 cols): one-hot matmul beats
# scatter-add up to P ~ 3.5k; scatter is flat (~7.5 ms) beyond.
# Re-validated round 2 vs the fast-P f32 scatter
# (scripts/microbench_mxu_crossover.py): MXU 10.1 vs scatter 13.8 ms at
# P=3072; scatter wins from P=6144 (13.9 vs 10.3). 3072 is optimal.
SEGMENT_MXU_MAX_P = int(os.environ.get("SM_SEGMENT_MXU_MAX_P", 3072))
_CHUNK = 4096

# HIGHEST (3-pass bf16) is bit-safer than the reference's sequential f32
# accumulation; DEFAULT saves ~30% matmul time at ~2e-4 relative error.
_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("SM_FUSION_PRECISION", "highest")]

# XLA's TPU row-scatter has a fast path for 16-bit element types (~6x
# faster than f32 at 0.5M segments: 15ms vs 94-103ms per 0.8MPix view;
# measured sweep in scripts/microbench_scatter.py). Three large-P methods:
#   exact16 (default): fixed-point limb decomposition riding ONE int16
#     scatter — as fast as bf16, as accurate as f32 (see
#     _segment_sum_exact16 below for the correctness argument).
#   float32: plain f32 scatter-add (the former default; slow path).
#   bfloat16: bf16 scatter (fast but the accumulator rounds every add:
#     ~0.8% max relative error; the bf16 hi+residual two-scatter split
#     only halves that to ~0.4% because accumulation error dominates —
#     measured, scripts/microbench_scatter.py).
# SM_SCATTER_DTYPE=bfloat16/float32 kept for back-compat.
_SCATTER_METHOD = os.environ.get(
    "SM_SCATTER",
    {"float32": "exact16", "bfloat16": "bfloat16"}[
        os.environ.get("SM_SCATTER_DTYPE", "float32")
    ],
)
if os.environ.get("SM_SCATTER_DTYPE") == "float32" and \
        "SM_SCATTER" not in os.environ:
    _SCATTER_METHOD = "float32"
if _SCATTER_METHOD not in ("exact16", "float32", "bfloat16"):
    raise ValueError(f"SM_SCATTER must be exact16|float32|bfloat16, "
                     f"got {_SCATTER_METHOD!r}")

# exact16 parameters: 24/SM_EXACT16_BITS limbs x SM_EXACT16_BITS bits of
# 24-bit fixed point (bits in {2, 3, 4, 6, 8}; default 6 = 4 limbs — the
# measured optimum: the round-2 12x2-bit layout costs 38.4 ms at the
# dense shape (786k rows x 21 cols, P=500k) vs 26.9 for 8x3 and 21.9
# (23.4 with the correction forced on) for 4x6, because the int16
# scatter/store volume scales with the limb count while the top-k MXU
# correction stays cheap (scripts/microbench_exact16.py --ablate_bits —
# the VERDICT r2 #3 ablation). The curve BOTTOMS at 4x6: 3x8-bit limbs
# measured a statistical tie without the correction (20.3 vs 20.5 ms)
# and a loss with it forced (25.4 vs 22.8 — k grows 768 -> 3072 at
# cap=255), because scatter columns are ~free below ~100 and 21 cols x
# 4 limbs already sits under that threshold; fewer limbs save nothing
# there while the 8-bit extraction loses the int16-lane split
# (8 does not divide 12). Wider limbs shrink the wrap-safe segment
# size (cap = (2^15-1)/2^(bits-1)), growing the correction k. A segment
# with more than `cap` rows could wrap a centered-limb int16 sum, and by
# pigeonhole at most rows/(cap+1) segments can do that, all of which sit
# inside the top-k counts and get the exact MXU correction — so accuracy
# is IDENTICAL for every width (24-bit quantization + exact correction).
# _EXACT16_CHUNK keeps per-(segment, chunk) row counts below 2^16 so the
# chunk-count columns are bijective mod 2^16 (exact counts).
_EXACT16_BITS = int(os.environ.get("SM_EXACT16_BITS", "6"))
if _EXACT16_BITS not in (2, 3, 4, 6, 8):
    raise ValueError(
        f"SM_EXACT16_BITS must be 2|3|4|6|8, got {_EXACT16_BITS}"
    )
_EXACT16_CHUNK = (1 << 16) - 1
_EXACT16_K = 64


def _exact16_config(bits):
    """(limbs, center, cap, groups) for a limb width.

    groups are (j0, j1) limb spans whose weighted partial sums stay exact
    in f32: a span's max value is cap * (B^(j1-j0) - 1) < 2^24 (int32
    bounds are looser and subsumed). Only segments with <= cap rows rely
    on these bounds — larger ones are replaced by the MXU correction."""
    B = 1 << bits
    limbs = 24 // bits
    center = 1 << (bits - 1)
    cap = ((1 << 15) - 1) // center
    groups = []
    j = 0
    while j < limbs:
        span = 1
        while j + span < limbs and (B ** (span + 1) - 1) * cap < (1 << 24):
            span += 1
        groups.append((j, j + span))
        j += span
    return limbs, center, cap, groups


_EXACT16_LIMBS, _, _EXACT16_CAP, _ = _exact16_config(_EXACT16_BITS)


def _segment_sum_exact16(data, idx, num_segments, bits=None):
    """Segment sum at 16-bit-scatter speed with f32-class accuracy.

    Exactness argument (the whole point — read before touching):
    - values are quantized to 24-bit fixed point q = round(v * scale) + 2^23
      with a power-of-2 `scale` chosen from max|v| (so quantization is the
      ONLY rounding; error <= 0.5/scale per row).
    - each q is decomposed into L = 24/bits centered `bits`-wide limbs
      c_j = l_j - 2^(bits-1) in [-2^(bits-1), 2^(bits-1) - 1] (bits from
      SM_EXACT16_BITS, default 6 -> 4 limbs); limbs ride as int16 columns
      of ONE scatter-add (columns are free: 63 vs 20 cols both ~15 ms,
      scripts/microbench_scatter.py). int16 addition wraps mod 2^16
      (verified on TPU), so a segment's limb sum is EXACT (no wrap at
      all) while |sum c_j| <= 2^(bits-1) * N < 2^15, i.e. for any
      segment with N <= cap = (2^15 - 1) / 2^(bits-1) rows (16383 at
      bits=2, 1023 at the default bits=6).
    - per-segment row counts are recovered EXACTLY for every N: chunk-count
      column k holds ones for rows with linear index in chunk k (chunks of
      65535 rows), so each per-(segment, chunk) count is < 2^16 and its
      int16 readout is bijective; summing decoded chunks in int32 gives N.
    - segments with N > cap (whose limb sums may have wrapped) number at
      most rows/(cap + 1) by pigeonhole; the top-k segments by exact
      count with k = max(64, ceil(rows/(cap + 1))) are ALWAYS recomputed
      with a masked one-hot MXU matmul (exact f32 dot; XLA fuses the
      one-hot compare into the dot operands, nothing materializes) and
      replace the limb results — so every possible wrap victim is fixed
      at every limb width, and accuracy is width-independent.
    - reconstruction groups limbs so every integer partial fits int32 and
      every f32 conversion is < 2^24 (exact); only the final two adds and
      the /scale round.

    Net: ~15-18 ms vs 94-103 ms for f32 scatter per 0.8 MPix view at 500k
    segments, max error = quantization (~2^-24 * max|v| * sqrt(N)), i.e.
    at or below the f32 scatter's own accumulation error (measured 1.7e-7
    max relative).

    data (N, D) f32 (already masked: dropped rows must carry idx ==
    num_segments); idx (N,) int32 in [0, num_segments].

    bits: limb width override (None -> SM_EXACT16_BITS). The centered
    limb range becomes [-2^(bits-1), 2^(bits-1)-1], the wrap-safe cap
    (2^15-1)/2^(bits-1) rows, and the reconstruction groups are derived
    so every partial stays f32-exact (_exact16_config).
    """
    n, d = data.shape
    P = num_segments
    bits = _EXACT16_BITS if bits is None else bits
    L, center, cap, groups = _exact16_config(bits)
    B = 1 << bits

    # per-COLUMN power-of-2 scales: columns with different ranges (probs
    # vs counts vs log-space tails) each use their full 24-bit budget
    vmax = jnp.max(jnp.abs(data), axis=0)  # (d,)
    _, e = jnp.frexp(vmax)  # vmax = m * 2^e, m in [0.5, 1)
    scale = jnp.where(vmax > 0, jnp.exp2(23.0 - e.astype(jnp.float32)),
                      jnp.float32(1.0))  # (d,)
    q = jnp.clip(
        jnp.round(data * scale[None, :]).astype(jnp.int32) + (1 << 23),
        0, (1 << 24) - 1,
    )  # (n, d) in [0, 2^24)

    if bits == 8:
        # 8 does not divide 12, so the 12|12 int16-lane split below can't
        # apply (limb 1 would straddle the halves); extract the three
        # byte limbs with int32 shifts and narrow after — slower per limb
        # than the int16-lane path (12.7 vs 9.3 ms/view class at 4 limbs)
        # but there are only 3 limbs.
        parts = [
            (((q >> (8 * j)) & 0xFF).astype(jnp.int16) - center)[:, :, None]
            for j in range(3)
        ]
        limbs16 = jnp.concatenate(parts, axis=2).reshape(n, d * L)
    else:
        # limb extraction in int16 lane arithmetic: split q into two
        # 12-bit halves (bits | 12 for widths 2|3|4|6), narrow FIRST,
        # then shift/mask int16 vectors (2x VPU lane throughput vs int32:
        # 9.3 vs 12.7 ms/view measured, scripts/microbench_exact16.py).
        # Layout (n, d, L) keeps the reshape contiguous; the low half
        # provides limbs 0..L/2-1, the high half L/2..L-1.
        q_lo = (q & 0xFFF).astype(jnp.int16)
        q_hi = (q >> 12).astype(jnp.int16)
        shifts = (jnp.arange(L // 2, dtype=jnp.int16) * bits).astype(
            jnp.int16
        )
        mask = jnp.int16(B - 1)
        lo = ((q_lo[:, :, None] >> shifts[None, None, :]) & mask) - center
        hi = ((q_hi[:, :, None] >> shifts[None, None, :]) & mask) - center
        limbs16 = jnp.concatenate([lo, hi], axis=2).reshape(n, d * L)

    nch = _cdiv_py(n, _EXACT16_CHUNK)
    chunk_of_row = jnp.arange(n, dtype=jnp.int32) // _EXACT16_CHUNK
    chunk_cols = (
        chunk_of_row[:, None] == jnp.arange(nch, dtype=jnp.int32)[None, :]
    ).astype(jnp.int16)

    upd = jnp.concatenate([limbs16, chunk_cols], axis=1)
    acc = jnp.zeros((P, L * d + nch), jnp.int16)
    acc = acc.at[idx].add(upd, mode="drop")

    W = acc[:, : L * d].astype(jnp.int32).reshape(P, d, L)
    craw = acc[:, L * d:].astype(jnp.int32)
    counts = jnp.sum(jnp.where(craw < 0, craw + (1 << 16), craw), axis=1)

    # true limb sums: S_j = W_j + center*N (in [0, (B-1)*N]); grouped so
    # every integer partial and every f32 conversion stays exact for
    # N <= cap (bound per group: cap * (B^span - 1) < 2^24, by
    # _exact16_config); the per-row +2^23 offset folds into the last
    # group (2^23 / B^j0 is integral because both are powers of two).
    S = W + center * counts[:, None, None]
    pB = (B ** jnp.arange(L, dtype=jnp.int32))
    total = jnp.zeros((P, d), jnp.float32)
    for gi, (j0, j1) in enumerate(groups):
        g = jnp.sum(S[:, :, j0:j1] * (pB[None, j0:j1] // int(B ** j0)),
                    axis=2)
        if gi == len(groups) - 1:
            g = g - ((1 << 23) // int(B ** j0)) * counts[:, None]
        total = total + g.astype(jnp.float32) * float(B ** j0)
    total = total / scale

    # exact MXU correction of every possible wrap victim. Only segments
    # with > cap rows can have wrapped, and there are at most
    # n / (cap + 1) of them by pigeonhole — k must scale with
    # the ROW count (a 4 MPix view can hold >64 over-cap segments), so
    # the top-k by exact count always covers every possible victim. When
    # the max count stays below the cap (micro-triangle scenes — the
    # common dense case) the whole correction is skipped on-device
    # (lax.cond, ~8 ms saved: top_k 4 ms + one-hot dot 4 ms per view).
    k = min(P, max(_EXACT16_K, -(-n // (cap + 1))))

    def _corrected(args):
        total, counts, data, idx = args
        _, heavy_ids = jax.lax.top_k(counts, k)
        onehot = (idx[:, None] == heavy_ids[None, :]).astype(jnp.float32)
        fix = jax.lax.dot_general(
            onehot, data,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (k, d)
        return total.at[heavy_ids].set(fix, mode="drop",
                                       unique_indices=True)

    return jax.lax.cond(
        jnp.max(counts) > cap,
        _corrected,
        lambda args: args[0],
        (total, counts, data, idx),
    )


def _cdiv_py(a, b):
    return -(-a // b)


def _segment_sum_mxu(data, idx, num_segments):
    """One-hot matmul segment sum: data (N, D) f32, idx (N,) int32 in
    [0, num_segments) (out-of-range rows contribute nothing)."""
    n, d = data.shape
    pad = (-n) % _CHUNK
    if pad:
        data = jnp.pad(data, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, (0, pad), constant_values=num_segments)
    chunks = data.reshape(-1, _CHUNK, d)
    idx_chunks = idx.reshape(-1, _CHUNK)
    seg_ids = jnp.arange(num_segments, dtype=idx.dtype)

    def step(acc, chunk):
        cdata, cidx = chunk
        onehot = (cidx[:, None] == seg_ids[None, :]).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot,
            cdata,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
        return acc, None

    acc0 = jnp.zeros((num_segments, d), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (chunks, idx_chunks))
    return acc


# XLA's f32 row scatter is FAST (~17 ms / 786k rows, same class as the
# 16-bit path) until the output row count crosses ~2^18, then ~6x slower;
# the cliff tracks P alone, not accumulator bytes (measured: P=262144 fast
# at 21 MB and 31 MB, P=393216 slow at 15 MB — scripts/microbench_scatter4.py).
_F32_FAST_MAX_P = 262_144


def effective_method(num_segments, method=None):
    """The path segment_sum will take: 'mxu' for small P, else the
    requested/default scatter method. The default 'exact16' auto-resolves
    to the plain f32 scatter below the P-cliff, where f32 is exact AND as
    fast; an explicit method=... is honored as given."""
    if num_segments <= SEGMENT_MXU_MAX_P:
        return "mxu"
    if method is None:
        method = _SCATTER_METHOD
        if method == "exact16" and num_segments <= _F32_FAST_MAX_P:
            return "float32"
    return method


def segment_sum(data, idx, num_segments, method=None):
    """TPU-tuned drop-in for jax.ops.segment_sum over rank-2 data.

    data (N, D) float32; idx (N,) integer; out-of-range indices are dropped.
    Dispatches to the MXU one-hot matmul for small segment counts and to a
    scatter method otherwise: `method` in {exact16, float32, bfloat16}
    (None -> SM_SCATTER env default, normally exact16). exact16's
    quantization is absolute in each COLUMN's max value (per-column
    scales); callers whose values span many orders WITHIN a column should
    split the column by magnitude range (see fusion's "mul-split") or
    pass method="float32".
    """
    data = jnp.asarray(data, jnp.float32)
    idx = jnp.asarray(idx)
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    method = effective_method(num_segments, method)
    if method == "mxu":
        # MXU path masks out-of-range via the one-hot comparison itself
        out = _segment_sum_mxu(data, idx.astype(jnp.int32), num_segments)
    else:
        valid = (idx >= 0) & (idx < num_segments)
        if method == "exact16":
            safe = jnp.where(valid, idx, num_segments).astype(jnp.int32)
            data = jnp.where(valid[:, None], data, 0.0)
            out = _segment_sum_exact16(data, safe, num_segments)
        else:
            dtype = jnp.float32 if method == "float32" else jnp.bfloat16
            safe = jnp.where(valid, idx, 0).astype(jnp.int32)
            data = jnp.where(valid[:, None], data, 0.0)
            out = jax.ops.segment_sum(
                data.astype(dtype), safe, num_segments=num_segments
            ).astype(jnp.float32)
    return out[:, 0] if squeeze else out
