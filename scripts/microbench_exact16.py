#!/usr/bin/env python3
"""exact16 phase breakdown at dense-preset shapes (786k rows, P=500k,
C=20+1): quantize+decompose vs scatter vs reconstruct vs the fused whole.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from semantic_meshes import ops

ROWS, P, D = 786_432, 500_000, 21


def coherent_ids(rows, segs, rng):
    base = (np.arange(rows, dtype=np.int64) * segs) // rows
    jitter = rng.integers(-3, 4, rows)
    return np.clip(base + jitter, 0, segs - 1).astype(np.int32)


def timeit(fn, args_dev, repeats, probe):
    out = fn(*args_dev)
    _ = np.asarray(probe(out))
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args_dev)
    _ = np.asarray(probe(out))
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--ablate_bits", action="store_true",
                    help="limb-width ablation (VERDICT r2 #3)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    data = jax.device_put(rng.random((ROWS, D), np.float32))
    idx = jax.device_put(coherent_ids(ROWS, P, rng))

    BITS = ops._EXACT16_BITS
    L, CENTER, _, _ = ops._exact16_config(BITS)
    B = 1 << BITS
    # the int16-lane 12|12 split variants only exist for widths dividing 12
    I16_SPLIT_OK = 12 % BITS == 0
    nch = -(-ROWS // ops._EXACT16_CHUNK)

    @jax.jit
    def decompose(data):
        # int32-lane extraction of the ACTIVE width's limbs
        vmax = jnp.max(jnp.abs(data), axis=0)
        _, e = jnp.frexp(vmax)
        scale = jnp.where(vmax > 0, jnp.exp2(23.0 - e.astype(jnp.float32)),
                          jnp.float32(1.0))
        q = jnp.clip(jnp.round(data * scale[None, :]).astype(jnp.int32)
                     + (1 << 23), 0, (1 << 24) - 1)
        shifts = jnp.arange(L, dtype=jnp.int32) * BITS
        limbs = ((q[:, :, None] >> shifts[None, None, :]) & (B - 1)) - CENTER
        limbs16 = limbs.reshape(ROWS, D * L).astype(jnp.int16)
        chunk = (jnp.arange(ROWS, dtype=jnp.int32) // ops._EXACT16_CHUNK)
        cols = (chunk[:, None] == jnp.arange(nch, dtype=jnp.int32)[None, :]
                ).astype(jnp.int16)
        return jnp.concatenate([limbs16, cols], axis=1)

    upd = jax.block_until_ready(decompose(data))
    dt = timeit(decompose, (data,), args.repeats, lambda o: o[0, 0])
    print(json.dumps({"phase": "quantize+decompose",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    if I16_SPLIT_OK:
        @jax.jit
        def decompose_i16(data):
            # variant: split q into two 12-bit halves, narrow to int16
            # FIRST, extract limbs with int16 lane arithmetic (2x vector
            # throughput; needs bits | 12 — the production path for
            # widths 2|3|4|6, ops._segment_sum_exact16)
            vmax = jnp.max(jnp.abs(data), axis=0)
            _, e = jnp.frexp(vmax)
            scale = jnp.where(
                vmax > 0, jnp.exp2(23.0 - e.astype(jnp.float32)),
                jnp.float32(1.0),
            )
            q = jnp.clip(jnp.round(data * scale[None, :]).astype(jnp.int32)
                         + (1 << 23), 0, (1 << 24) - 1)
            q_lo = (q & 0xFFF).astype(jnp.int16)
            q_hi = (q >> 12).astype(jnp.int16)
            shifts = (jnp.arange(L // 2, dtype=jnp.int16)
                      * jnp.int16(BITS))
            lo = ((q_lo[:, :, None] >> shifts[None, None, :])
                  & jnp.int16(B - 1)) - jnp.int16(CENTER)
            hi = ((q_hi[:, :, None] >> shifts[None, None, :])
                  & jnp.int16(B - 1)) - jnp.int16(CENTER)
            limbs16 = jnp.concatenate([lo, hi], axis=2).reshape(
                ROWS, D * L
            )
            chunk = (jnp.arange(ROWS, dtype=jnp.int32)
                     // ops._EXACT16_CHUNK)
            cols = (chunk[:, None]
                    == jnp.arange(nch, dtype=jnp.int32)[None, :]
                    ).astype(jnp.int16)
            return jnp.concatenate([limbs16, cols], axis=1)

        jax.block_until_ready(decompose_i16(data))
        dt = timeit(decompose_i16, (data,), args.repeats, lambda o: o[0, 0])
        print(json.dumps({"phase": "quantize+decompose_i16",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    if I16_SPLIT_OK:
        @jax.jit
        def decompose_i16_nocat(data):
            # isolate the concat cost: limbs only, single reshape, no
            # chunk columns
            vmax = jnp.max(jnp.abs(data), axis=0)
            _, e = jnp.frexp(vmax)
            scale = jnp.where(
                vmax > 0, jnp.exp2(23.0 - e.astype(jnp.float32)),
                jnp.float32(1.0),
            )
            q = jnp.clip(jnp.round(data * scale[None, :]).astype(jnp.int32)
                         + (1 << 23), 0, (1 << 24) - 1)
            q_lo = (q & 0xFFF).astype(jnp.int16)
            q_hi = (q >> 12).astype(jnp.int16)
            shifts = (jnp.arange(L // 2, dtype=jnp.int16)
                      * jnp.int16(BITS))
            lo = ((q_lo[:, :, None] >> shifts[None, None, :])
                  & jnp.int16(B - 1)) - jnp.int16(CENTER)
            hi = ((q_hi[:, :, None] >> shifts[None, None, :])
                  & jnp.int16(B - 1)) - jnp.int16(CENTER)
            half = D * (L // 2)
            return lo.reshape(ROWS, half), hi.reshape(ROWS, half)

        jax.block_until_ready(decompose_i16_nocat(data))
        dt = timeit(decompose_i16_nocat, (data,), args.repeats,
                    probe=lambda o: o[0][0, 0])
        print(json.dumps({"phase": "decompose_i16_nocat",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    @jax.jit
    def narrow_only(data):
        # floor probe: one elementwise int16 production of the same bytes
        q = (data * 1024.0).astype(jnp.int16)
        return jnp.tile(q, (1, L))

    jax.block_until_ready(narrow_only(data))
    dt = timeit(narrow_only, (data,), args.repeats, lambda o: o[0, 0])
    print(json.dumps({"phase": "narrow_tile_floor",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    @jax.jit
    def scat(upd, idx):
        acc = jnp.zeros((P, L * D + nch), jnp.int16)
        return acc.at[idx].add(upd, mode="drop")

    acc = jax.block_until_ready(scat(upd, idx))
    dt = timeit(scat, (upd, idx), args.repeats, lambda o: o[0, 0])
    print(json.dumps({"phase": "int16_scatter", "ms": round(dt * 1e3, 2)}),
          flush=True)

    @jax.jit
    def whole(data, idx):
        return ops._segment_sum_exact16(data, idx, P)

    dt = timeit(whole, (data, idx), args.repeats, lambda o: o[0, 0])
    print(json.dumps({"phase": "whole_exact16", "ms": round(dt * 1e3, 2)}),
          flush=True)

    @jax.jit
    def f32ref(data, idx):
        out = jnp.zeros((P, D), jnp.float32)
        return out.at[idx].add(data, mode="drop")

    dt = timeit(f32ref, (data, idx), args.repeats, lambda o: o[0, 0])
    print(json.dumps({"phase": "f32_scatter_ref", "ms": round(dt * 1e3, 2)}),
          flush=True)

    if args.ablate_bits:
        # VERDICT r2 #3: the 12x2-bit layout is one point on the
        # limbs-vs-correction curve. Wider limbs cut the int16 scatter
        # column count (and decompose store bytes) by limbs/12, but
        # shrink the wrap-safe cap, growing the top-k MXU correction
        # (k = rows/(cap+1)) — and the heavy-segment regime forces the
        # correction cond TRUE here to charge that cost honestly.
        import functools

        base_idx = np.asarray(idx).copy()
        for bits in (2, 3, 4, 6, 8):
            L, center, cap, groups = ops._exact16_config(bits)
            # the heavy segment must exceed THIS width's wrap cap or the
            # correction cond stays False and dth silently measures the
            # uncorrected path (same construction as test_ops' per-width
            # heavy tests). Widths 2/3/4 have caps 16383/8191/4095, so a
            # single shared 2023-row segment (the original bug) only
            # charged the correction for bits 6 and 8.
            heavy_idx = base_idx.copy()
            heavy_idx[: cap + 500] = 17
            heavy_idx = jax.device_put(heavy_idx)

            @functools.partial(jax.jit, static_argnames=("bits",))
            def whole_b(data, idx, *, bits):
                return ops._segment_sum_exact16(data, idx, P, bits=bits)

            f = functools.partial(whole_b, bits=bits)
            dt = timeit(f, (data, idx), args.repeats, lambda o: o[0, 0])
            dth = timeit(f, (data, heavy_idx), args.repeats,
                         lambda o: o[0, 0])
            print(json.dumps({
                "phase": f"ablate_bits_{bits}",
                "limbs": L, "cap": cap,
                "k": max(ops._EXACT16_K, -(-ROWS // (cap + 1))),
                "ms_no_correction": round(dt * 1e3, 2),
                "ms_with_correction": round(dth * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
