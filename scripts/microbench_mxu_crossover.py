#!/usr/bin/env python3
"""MXU one-hot segment-sum vs f32 fast-path scatter, mid-P sweep.

The one-hot chunked matmul (ops._segment_sum_mxu) costs O(rows * P * D);
the f32 row scatter below the 2^18 P-cliff costs ~21 ns/row flat. The
crossover sets SEGMENT_MXU_MAX_P.
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


def coherent_ids(rows, segs, rng):
    base = (np.arange(rows, dtype=np.int64) * segs) // rows
    jitter = rng.integers(-3, 4, rows)
    return np.clip(base + jitter, 0, segs - 1).astype(np.int32)


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

    for P in (3_072, 6_144, 12_288, 24_576, 49_152):
        idx = jax.device_put(coherent_ids(rows, P, rng))

        def mxu(d, i, P=P):
            return ops._segment_sum_mxu(d, i, P)

        def scat(d, i, P=P):
            out = jnp.zeros((P, 21), jnp.float32)
            return out.at[i].add(d, mode="drop")

        t_m = time_dispatches(jax.jit(mxu), (data, idx), args.repeats)
        t_s = time_dispatches(jax.jit(scat), (data, idx), args.repeats)
        print(json.dumps({"P": P, "mxu_ms": round(t_m * 1e3, 2),
                          "f32_scatter_ms": round(t_s * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
