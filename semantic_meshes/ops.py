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
SEGMENT_MXU_MAX_P = int(os.environ.get("SM_SEGMENT_MXU_MAX_P", 3072))
_CHUNK = 4096

# HIGHEST (3-pass bf16) is bit-safer than the reference's sequential f32
# accumulation; DEFAULT saves ~30% matmul time at ~2e-4 relative error.
_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("SM_FUSION_PRECISION", "highest")]

# XLA's TPU row-scatter has a fast path for 16-bit element types (~6x
# faster than f32 at 0.5M segments: 16ms vs 94ms per 0.8MPix view).
# SM_SCATTER_DTYPE=bfloat16 opts the large-P fallback into it — the
# accumulator then rounds in bf16 (~1% error on big per-primitive pixel
# counts), so it is off by default; exact f32 is the parity mode.
_SCATTER_DTYPE = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}[os.environ.get("SM_SCATTER_DTYPE", "float32")]


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


def segment_sum(data, idx, num_segments):
    """TPU-tuned drop-in for jax.ops.segment_sum over rank-2 data.

    data (N, D) float32; idx (N,) integer; out-of-range indices are dropped.
    Dispatches to the MXU one-hot matmul for small segment counts and to
    scatter-add otherwise.
    """
    data = jnp.asarray(data, jnp.float32)
    idx = jnp.asarray(idx)
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    if num_segments <= SEGMENT_MXU_MAX_P:
        # MXU path masks out-of-range via the one-hot comparison itself
        out = _segment_sum_mxu(data, idx.astype(jnp.int32), num_segments)
    else:
        valid = (idx >= 0) & (idx < num_segments)
        safe = jnp.where(valid, idx, 0).astype(jnp.int32)
        data = jnp.where(valid[:, None], data, 0.0)
        out = jax.ops.segment_sum(
            data.astype(_SCATTER_DTYPE), safe, num_segments=num_segments
        ).astype(jnp.float32)
    return out[:, 0] if squeeze else out
