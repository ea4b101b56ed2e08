#!/usr/bin/env python3
"""Follow-up scatter measurements for the exact16 limb design.

Questions:
- does the int16 fast path survive ~100-300 columns (13 limbs x 21 cols)?
- what does jax.lax.top_k(counts, 64) over 500k cost?
- does a small-row int16 scatter amortize (49k rows)?
- one-hot (786k x 64) masked MXU segment sum cost (the heavy-segment
  correction pass)?
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

ROWS = 786_432
SEGS = 500_000


def coherent_ids(rows, segs, rng):
    base = (np.arange(rows, dtype=np.int64) * segs) // rows
    jitter = rng.integers(-3, 4, rows)
    return np.clip(base + jitter, 0, segs - 1).astype(np.int32)


def make_scatter(rows, cols, dtype):
    @jax.jit
    def f(data, idx):
        out = jnp.zeros((SEGS, cols), dtype)
        return out.at[idx].add(data, mode="drop")

    return f


def time_dispatches(fn, args_dev, repeats, probe=lambda o: o[0, 0]):
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
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    idx = coherent_ids(ROWS, SEGS, rng)
    idx_dev = jax.device_put(idx)

    for cols in (105, 168, 275):
        data = jax.device_put(
            (rng.random((ROWS, cols)) * 3).astype(np.int16))
        fn = make_scatter(ROWS, cols, jnp.int16)
        dt = time_dispatches(fn, (data, idx_dev), args.repeats)
        print(json.dumps({"config": f"i16x{cols}",
                          "ms": round(dt * 1e3, 2)}), flush=True)

    # small-row int16 scatter (does the per-row rate hold at 49k rows?)
    small_idx = jax.device_put(idx[:49152])
    data = jax.device_put((rng.random((49152, 63)) * 3).astype(np.int16))
    fn = make_scatter(49152, 63, jnp.int16)
    dt = time_dispatches(fn, (data, small_idx), args.repeats)
    print(json.dumps({"config": "i16x63_rows49k", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # top_k(counts, 64) over 500k
    counts = jax.device_put(rng.random(SEGS).astype(np.float32))

    @jax.jit
    def topk(c):
        return jax.lax.top_k(c, 64)

    dt = time_dispatches(topk, (counts,), args.repeats,
                         probe=lambda o: o[0][0])
    print(json.dumps({"config": "top_k_64_of_500k", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # heavy-correction one-hot: (786k, 64) one-hot vs (786k, 21) data
    vals = jax.device_put(rng.random((ROWS, 21)).astype(np.float32))
    heavy = jax.device_put(np.arange(64, dtype=np.int32))

    @jax.jit
    def onehot_fix(data, ids, heavy_ids):
        oh = (ids[:, None] == heavy_ids[None, :]).astype(jnp.float32)
        return jax.lax.dot_general(
            oh, data, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    dt = time_dispatches(onehot_fix, (vals, idx_dev, heavy),
                         args.repeats)
    print(json.dumps({"config": "onehot_fix_64", "ms": round(dt * 1e3, 2)}),
          flush=True)

    # --- micro-rasterizer building blocks (dense preset, 2M fragments) ---
    M = 4 * 499392
    frag_pix = rng.integers(0, ROWS + 1, size=M).astype(np.int32)
    frag_z = rng.integers(1, 2**30, size=M).astype(np.int32)
    frag_tri = rng.integers(0, 499392, size=M).astype(np.int32)
    d_pix, d_z, d_tri = map(jax.device_put, (frag_pix, frag_z, frag_tri))

    @jax.jit
    def sort3(p, z, t):
        return jax.lax.sort((p, z, t), dimension=0, is_stable=False,
                            num_keys=3)

    @jax.jit
    def sort2_stable(p, z, t):
        return jax.lax.sort((p, z, t), dimension=0, is_stable=True,
                            num_keys=2)

    @jax.jit
    def sort2_payload2(p, z, t):
        # 2 int32 keys + 2 payloads (tri + zbits carried through)
        return jax.lax.sort((p, z, t, z), dimension=0, is_stable=True,
                            num_keys=2)

    for name, fn in (("sort3_2M", sort3), ("sort2_stable_2M", sort2_stable),
                     ("sort2_stable_2payload_2M", sort2_payload2)):
        dt = time_dispatches(fn, (d_pix, d_z, d_tri), args.repeats,
                             probe=lambda o: o[0][0])
        print(json.dumps({"config": name, "ms": round(dt * 1e3, 2)}),
              flush=True)

    # set-scatter of (z, tri) rows into a (HW, 2) image
    HW = ROWS
    rows2 = jax.device_put(
        np.stack([frag_z, frag_tri], -1).astype(np.int32))

    @jax.jit
    def set_scatter_unsorted(pix, vals2):
        img = jnp.full((HW, 2), jnp.int32(0x7F800000))
        return img.at[pix].set(vals2, mode="drop", unique_indices=True)

    dt = time_dispatches(set_scatter_unsorted, (d_pix, rows2), args.repeats)
    print(json.dumps({"config": "set_scatter_2M_unsorted",
                      "ms": round(dt * 1e3, 2)}), flush=True)

    sorted_pix = jax.device_put(np.sort(frag_pix[:HW]))
    rows_sorted = jax.device_put(
        np.stack([frag_z[:HW], frag_tri[:HW]], -1).astype(np.int32))

    @jax.jit
    def set_scatter_sorted(pix, vals2):
        img = jnp.full((HW, 2), jnp.int32(0x7F800000))
        return img.at[pix].set(vals2, mode="drop", unique_indices=True,
                               indices_are_sorted=True)

    dt = time_dispatches(set_scatter_sorted, (sorted_pix, rows_sorted),
                         args.repeats)
    print(json.dumps({"config": "set_scatter_786k_sorted",
                      "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
