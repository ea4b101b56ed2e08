#!/usr/bin/env python3
"""Bracket the f32 row-scatter P-cliff (accumulator falling out of VMEM?).

microbench_scatter3.py: f32x21 at 786k rows costs ~17 ms up to P=100k but
~105 ms at P=500k. Find the transition and whether it tracks accumulator
BYTES (P * cols * 4) by varying columns too.
"""

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
    rows = 786_432
    data = jax.device_put(rng.random((rows, 21), np.float32))
    for P in (131_072, 196_608, 262_144, 393_216):
        idx = jax.device_put(coherent_ids(rows, P, rng))
        t = time_dispatches(make_scatter(P, 21, jnp.float32),
                            (data, idx), args.repeats)
        print(json.dumps({"P": P, "cols": 21, "acc_MB":
                          round(P * 21 * 4 / 2**20, 1),
                          "f32_ms": round(t * 1e3, 2)}), flush=True)
    # does the cliff track bytes? halve the columns at the cliff-side P
    data10 = jax.device_put(rng.random((rows, 10), np.float32))
    data41 = jax.device_put(rng.random((rows, 41), np.float32))
    for P, cols, d in ((393_216, 10, data10), (196_608, 41, data41),
                       (500_000, 10, data10), (100_000, 41, data41)):
        idx = jax.device_put(coherent_ids(rows, P, rng))
        t = time_dispatches(make_scatter(P, cols, jnp.float32),
                            (d, idx), args.repeats)
        print(json.dumps({"P": P, "cols": cols, "acc_MB":
                          round(P * cols * 4 / 2**20, 1),
                          "f32_ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
