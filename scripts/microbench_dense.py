#!/usr/bin/env python3
"""Phase breakdown of the dense-preset view (500k-triangle cube, 1024x768).

The dense preset runs at ~6.6 MPix/s vs the 10 MPix/s north star; a view
costs ~119 ms of which ~59 ms is rasterize and ~94 ms-class is the fusion
scatter (overlapped dispatch hides part). This script times each dense
pipeline phase as its own jitted program, steady state, to direct the
optimization (see docs/PERFORMANCE.md "Known limits").

Methodology per CLAUDE.md: warm, dispatch REPEATS back-to-back, single
device->host readback.
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

from semantic_meshes import testing
from semantic_meshes.data import stack_cameras
from semantic_meshes.rasterize import dense
from semantic_meshes.rasterize import xla as xla_rast

H, W = 768, 1024


def timeit(fn, args_dev, repeats, probe):
    out = fn(*args_dev)
    _ = np.asarray(probe(out))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args_dev)
    _ = np.asarray(probe(out))
    return (time.perf_counter() - t0) / repeats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--subdivisions", type=int, default=204)
    args = ap.parse_args()

    vertices, faces = testing.make_cube(subdivisions=args.subdivisions)
    cams = testing.make_ring_cameras(num_views=4, width=W, height=H)
    rot, trans, fl, pp = stack_cameras(cams)
    T = len(faces)
    print(json.dumps({"triangles": int(T)}), flush=True)

    fv = jnp.asarray(vertices, jnp.float32)[jnp.asarray(faces, jnp.int32)]
    dev = jax.device_put((jnp.asarray(vertices, jnp.float32),
                          jnp.asarray(faces, jnp.int32),
                          rot[0], trans[0], fl[0], pp[0], fv))
    v, f, r0, t0_, fl0, pp0, fv = dev

    e_cap_rows = int(dense.candidate_count(
        v, f, r0, t0_, fl0, pp0, height=H, width=W)) * 2
    print(json.dumps({"candidate_rows": e_cap_rows // 2}), flush=True)

    yoff = jnp.float32(0.0)

    setup_fn = jax.jit(lambda v, f, r, t, flx, ppx, fvx: xla_rast._make_setup(
        v, f, r, t, flx, ppx, fvx, False))
    setup_args = (v, f, r0, t0_, fl0, pp0, fv)
    dt = timeit(setup_fn, setup_args, args.repeats, lambda o: o["denom"][0])
    print(json.dumps({"phase": "setup", "ms": round(dt * 1e3, 2)}), flush=True)

    setup = jax.block_until_ready(setup_fn(*setup_args))
    e_cap = dense._cdiv(max(e_cap_rows, dense.CHUNK), dense.CHUNK) * dense.CHUNK

    bins_fn = jax.jit(lambda s: dense._build_sorted_bins(
        s, H, W, yoff, e_cap, 1024))
    dt = timeit(bins_fn, (setup,), args.repeats, lambda o: o[0][0])
    print(json.dumps({"phase": "build_sorted_bins", "ms": round(dt * 1e3, 2)}),
          flush=True)

    micro = jax.block_until_ready(
        jax.jit(lambda s: dense._classify(s, H, W, yoff)[0])(setup))
    micro_fn = jax.jit(lambda s, m: dense._rasterize_micro(s, m, H, W, yoff))
    dt = timeit(micro_fn, (setup, micro), args.repeats, lambda o: o[0][0, 0])
    print(json.dumps({"phase": "rasterize_micro", "ms": round(dt * 1e3, 2)}),
          flush=True)

    full_fn = jax.jit(lambda v, f, r, t, flx, ppx, fvx: dense.rasterize(
        v, f, r, t, flx, ppx, face_vertices=fvx, height=H, width=W,
        e_cap_rows=e_cap_rows))
    dt = timeit(full_fn, setup_args, args.repeats, lambda o: o[0][0, 0])
    print(json.dumps({"phase": "full_dense_rasterize", "ms": round(dt * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
