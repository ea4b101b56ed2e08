#!/usr/bin/env python3
"""Scatter cost vs SEGMENT COUNT (P) — is the f32 row scatter cheap at
moderate P? The e2e preset (P=49k texels, 2.1M pixel rows) regressed when
exact16 replaced f32, suggesting the f32 slow path's cost depends on P,
not only on update rows."""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def coherent_ids(rows, segs, rng):
    base = (np.arange(rows, dtype=np.int64) * segs) // rows
    jitter = rng.integers(-3, 4, rows)
    return np.clip(base + jitter, 0, segs - 1).astype(np.int32)


def make_scatter(P, cols, dtype):
    @jax.jit
    def f(data, idx):
        out = jnp.zeros((P, cols), dtype)
        return out.at[idx].add(data, mode="drop")

    return f


def time_dispatches(fn, args_dev, repeats):
    out = fn(*args_dev)
    _ = np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args_dev)
    _ = np.asarray(out[0, 0])
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for rows in (786_432, 2_097_152):
        data_f32 = jax.device_put(rng.random((rows, 21), np.float32))
        data_i16 = jax.device_put(
            (rng.random((rows, 252)) * 3).astype(np.int16))
        for P in (10_000, 49_152, 100_000, 500_000):
            idx = jax.device_put(coherent_ids(rows, P, rng))
            t32 = time_dispatches(make_scatter(P, 21, jnp.float32),
                                  (data_f32, idx), args.repeats)
            t16 = time_dispatches(make_scatter(P, 252, jnp.int16),
                                  (data_i16, idx), args.repeats)
            print(json.dumps({
                "rows": rows, "P": P,
                "f32x21_ms": round(t32 * 1e3, 2),
                "i16x252_ms": round(t16 * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
