#!/usr/bin/env python3
"""Row scatter-add rate sweep on the real TPU (dense-preset fusion ablation).

Answers three questions that decide how to make exact large-P fusion fast
(ref: fusion at 500k+ segments is scatter-bound; see docs/PERFORMANCE.md
"Known limits"):

1. does int16 hit the same 16-bit fast path as bf16/f16/int8?  (int16 adds
   wrap mod 2^16 => EXACT accumulation of bounded fixed-point limbs, unlike
   bf16 whose accumulator rounds every add)
2. does the per-row cost depend on the COLUMN count?  (if not, several
   10-bit limbs can ride one wide int16 scatter for the price of one)
3. does a narrow f32 row (<= 8 cols) hit the fast path?  (if yes, exact f32
   column-splitting wins outright)

Also measures the accuracy of the bf16 hi+residual two-scatter idea
(VERDICT round 1, next-round item 2): the split removes representation
error but NOT the bf16 accumulator's per-add rounding, which this script
quantifies against an f64 oracle.

Methodology per CLAUDE.md: warm compile first, then REPEATS back-to-back
dispatches and a single device->host readback (block_until_ready does not
reliably block through the axon tunnel; per-call readback costs ~25 ms).
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

ROWS = 786_432  # 1024 x 768
SEGS = 500_000


def coherent_ids(rows, segs, rng):
    """Micro-triangle-render-like ids: roughly monotone in pixel order with
    local jitter (never microbench with purely random indices)."""
    base = (np.arange(rows, dtype=np.int64) * segs) // rows
    jitter = rng.integers(-3, 4, rows)
    return np.clip(base + jitter, 0, segs - 1).astype(np.int32)


def make_scatter(cols, dtype):
    @jax.jit
    def f(data, idx):
        out = jnp.zeros((SEGS, cols), dtype)
        return out.at[idx].add(data, mode="drop")

    return f


def time_dispatches(fn, args_dev, repeats):
    out = fn(*args_dev)
    _ = float(np.asarray(out[0, 0]).astype(np.float64))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args_dev)
    _ = float(np.asarray(out[0, 0]).astype(np.float64))
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--configs", default="")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    idx = coherent_ids(ROWS, SEGS, rng)
    idx_rand = rng.permutation(idx)
    base = rng.random((ROWS, 64), np.float32)

    configs = [
        ("f32", jnp.float32, 20),
        ("f32", jnp.float32, 8),
        ("f32", jnp.float32, 4),
        ("bf16", jnp.bfloat16, 20),
        ("bf16", jnp.bfloat16, 63),
        ("i16", jnp.int16, 20),
        ("i16", jnp.int16, 63),
        ("i8", jnp.int8, 20),
    ]
    if args.configs:
        keep = set(args.configs.split(","))
        configs = [c for c in configs if f"{c[0]}x{c[2]}" in keep]

    idx_dev = jax.device_put(idx)
    idx_rand_dev = jax.device_put(idx_rand)
    results = []
    for name, dtype, cols in configs:
        if name.startswith("i"):
            np_dtype = {"i16": np.int16, "i8": np.int8}[name]
            data = (base[:, :cols] * 100).astype(np_dtype)
        else:
            data = base[:, :cols].astype(np.float32)
        data_dev = jax.device_put(jnp.asarray(data, dtype))
        fn = make_scatter(cols, dtype)
        dt = time_dispatches(fn, (data_dev, idx_dev), args.repeats)
        dt_rand = time_dispatches(fn, (data_dev, idx_rand_dev), args.repeats)
        row = {
            "config": f"{name}x{cols}",
            "ms_coherent": round(dt * 1e3, 2),
            "ms_random": round(dt_rand * 1e3, 2),
            "ns_per_row": round(dt / ROWS * 1e9, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- int16 wrap semantics check (exactness of the limb scheme) ---
    big = np.full((1000,), 30_000, np.int16)
    ids = np.zeros((1000,), np.int32)
    f = make_scatter(1, jnp.int16)
    got = int(np.asarray(f(jax.device_put(big[:, None]), jax.device_put(ids)))[0, 0])
    want = (30_000 * 1000) % (1 << 16)
    if want >= 1 << 15:
        want -= 1 << 16  # two's complement
    print(json.dumps({"int16_wrap_exact": got == want, "got": got,
                      "want_mod_2^16": want}), flush=True)

    # --- bf16 hi+residual accuracy vs f64 oracle (VERDICT item 2 idea) ---
    vals = base[:, :20].astype(np.float32)
    hi_f32 = np.asarray(jnp.asarray(vals, jnp.bfloat16), np.float32)
    lo = vals - hi_f32
    fbf = make_scatter(20, jnp.bfloat16)
    s_hi = np.asarray(fbf(jax.device_put(jnp.asarray(hi_f32, jnp.bfloat16)),
                          idx_dev), np.float64)
    s_lo = np.asarray(fbf(jax.device_put(jnp.asarray(lo, jnp.bfloat16)),
                          idx_dev), np.float64)
    oracle = np.zeros((SEGS, 20), np.float64)
    np.add.at(oracle, idx, vals.astype(np.float64))
    recon = s_hi + s_lo
    nz = oracle.sum(1) > 0
    rel = np.abs(recon[nz] - oracle[nz]) / np.maximum(np.abs(oracle[nz]), 1e-30)
    f32_direct = make_scatter(20, jnp.float32)
    s_f32 = np.asarray(f32_direct(jax.device_put(vals), idx_dev), np.float64)
    rel_f32 = np.abs(s_f32[nz] - oracle[nz]) / np.maximum(np.abs(oracle[nz]), 1e-30)
    sbf = np.asarray(fbf(jax.device_put(jnp.asarray(vals, jnp.bfloat16)),
                         idx_dev), np.float64)
    rel_bf = np.abs(sbf[nz] - oracle[nz]) / np.maximum(np.abs(oracle[nz]), 1e-30)
    print(json.dumps({
        "bf16_hi_lo_rel_err": {"max": float(rel.max()), "mean": float(rel.mean())},
        "bf16_plain_rel_err": {"max": float(rel_bf.max()), "mean": float(rel_bf.mean())},
        "f32_scatter_rel_err": {"max": float(rel_f32.max()), "mean": float(rel_f32.mean())},
        "note": "hi+residual fixes representation error only; accumulator "
                "rounding (per-add, inside the scatter) is untouched",
    }), flush=True)


if __name__ == "__main__":
    main()
