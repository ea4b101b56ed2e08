#!/usr/bin/env python3
"""Phase breakdown of the scannet bench preset (TPU).

Where do the ~59 ms/view go? Isolates, per view of the scannet preset
(99k tris, 1296x968, 40 classes):
  - full fused step (rasterize + fusion)      [the bench number]
  - dense.rasterize alone
  - micro-fragment path alone (e_cap_rows=0 run on a probe-true budget
    is not representative here: this preset has 107k real candidates)
  - binning sort + packed-table gather (no kernel): approximated by
    timing _build_sorted_bins + _gather_candidate_tables as one jit
  - fusion alone (view_accumulate on a pre-rendered primitive image)

Methodology per CLAUDE.md: amortized dispatches, single readback, take
the min of repeats.
"""

import functools
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sm_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from semantic_meshes import testing
from semantic_meshes.data import stack_cameras
from semantic_meshes.rasterize import dense, xla as xr
from semantic_meshes import distributed, fusion

SUB, W, H, C = 91, 1296, 968, 40
REPS = 20


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x).ravel()[:1], out
    )  # warm + sync
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    vertices, faces = testing.make_cube(subdivisions=SUB)
    cams = testing.make_ring_cameras(num_views=1, width=W, height=H)
    rot, trans, fl, pp = stack_cameras(cams)
    rng = np.random.default_rng(0)
    probs = testing.random_probs(rng, H, W, C)
    v, f = jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32)
    args = jax.device_put((v, f, rot[0], trans[0], fl[0], pp[0]))
    probs_d = jax.device_put(jnp.asarray(probs))

    e_cap = int(dense.candidate_count(*args, height=H, width=W))
    print(f"candidates: {e_cap} (SM_MICRO_MAX={dense.MICRO_MAX})")
    # routing-threshold curve: (tile,tri) pairs vs fragment triangles per
    # micro_max — run the full A/B with SM_MICRO_MAX=<m> in the env
    for m in (1, 2, 3, 4, 6):
        p, mu = (int(x) for x in np.asarray(dense.candidate_stats(
            *args, height=H, width=W, micro_max=m
        )))
        print(f"  micro_max={m}: pairs={p} micro_tris={mu} "
              f"(fragment rows = {m * m} x micro)")
    e_cap2 = 2 * e_cap

    rast_fn = functools.partial(
        dense.rasterize, height=H, width=W, e_cap_rows=e_cap2
    )
    print(f"rasterize full: {timed(rast_fn, *args):.2f} ms")

    @functools.partial(jax.jit, static_argnames=("height", "width", "e_cap"))
    def bins_only(v, f, r, t, fl_, pp_, *, height, width, e_cap):
        setup = xr._make_setup(v, f, r, t, fl_, pp_, None, False)
        tri_sorted, starts, overflow, micro = dense._build_sorted_bins(
            setup, height, width, jnp.float32(0), e_cap, 1024
        )
        return tri_sorted[::1024], starts[::64], overflow

    cap_rounded = -(-max(e_cap2, dense.CHUNK) // dense.CHUNK) * dense.CHUNK
    print(
        f"setup+classify+binning sort: "
        f"{timed(functools.partial(bins_only, height=H, width=W, e_cap=cap_rounded), *args):.2f} ms"
    )

    @functools.partial(jax.jit, static_argnames=("height", "width", "e_cap"))
    def bins_gather(v, f, r, t, fl_, pp_, *, height, width, e_cap):
        from semantic_meshes.rasterize.pallas_kernel import (
            _gather_candidate_tables,
        )

        setup = xr._make_setup(v, f, r, t, fl_, pp_, None, False)
        tri_sorted, starts, overflow, micro = dense._build_sorted_bins(
            setup, height, width, jnp.float32(0), e_cap, 1024
        )
        table = _gather_candidate_tables(setup, tri_sorted[None, :])[0]
        return table[::4096, :1], starts[::64]

    print(
        f"  + packed-table gather: "
        f"{timed(functools.partial(bins_gather, height=H, width=W, e_cap=cap_rounded), *args):.2f} ms"
    )

    @functools.partial(jax.jit, static_argnames=("height", "width"))
    def micro_only(v, f, r, t, fl_, pp_, *, height, width):
        setup = xr._make_setup(v, f, r, t, fl_, pp_, None, False)
        micro, small, big, *_ = dense._classify(
            setup, height, width, jnp.float32(0)
        )
        z, idx = dense._rasterize_micro(
            setup, micro, height, width, jnp.float32(0)
        )
        return z[::64, ::64], idx[::64, ::64]

    print(
        f"setup+micro fragment path (8.7k micro tris): "
        f"{timed(functools.partial(micro_only, height=H, width=W), *args):.2f} ms"
    )

    # fusion alone on a real rendered image
    tri_img, _z, _ov = rast_fn(*args)
    prim = jnp.where(tri_img >= 0, tri_img, len(faces)).astype(jnp.int32)
    prim = jax.device_put(prim)

    @jax.jit
    def fuse_only(prim, probs):
        return fusion._accumulate_view(
            prim, probs, None, jnp.float32(0.5),
            num_primitives=len(faces), aggregator="sum",
        )

    print(f"fusion (P={len(faces)}): {timed(fuse_only, prim, probs_d):.2f} ms")

    # end-to-end single view for reference
    from semantic_meshes import distributed

    @functools.partial(jax.jit, static_argnames=("e_cap",))
    def full(v, f, r, t, fl_, pp_, probs, *, e_cap):
        delta, ov = distributed.render_and_accumulate(
            v, f, (r, t, fl_, pp_), probs, None, jnp.float32(0.5),
            num_primitives=len(faces), aggregator="sum",
            height=H, width=W, dense_e_cap=e_cap,
        )
        return delta[:1, :1], ov

    print(
        f"full render+fuse step: "
        f"{timed(functools.partial(full, e_cap=e_cap2), *args, probs_d):.2f} ms"
    )

    # marginal in-pipeline costs over an 8-view scan (the bench preset's
    # actual program shape — isolated phase numbers do NOT compose, XLA
    # overlaps phases inside the scan)
    NV = 8
    cams8 = testing.make_ring_cameras(num_views=NV, width=W, height=H)
    rot8, trans8, fl8, pp8 = jax.device_put(stack_cameras(cams8))
    probs8 = jax.device_put(
        jnp.broadcast_to(jnp.asarray(probs), (NV, H, W, C))
    )
    stats8 = np.asarray(dense.candidate_stats(
        v, f, rot8[0], trans8[0], fl8[0], pp8[0], height=H, width=W
    ))
    caps8 = (2 * int(stats8[0]), 2 * int(stats8[1]))

    fuse = functools.partial(
        distributed.fuse_views,
        num_primitives=len(faces), aggregator="sum",
        height=H, width=W, dense_e_cap=caps8,
    )
    t_fuse = timed(
        lambda: fuse(v, f, rot8, trans8, fl8, pp8, probs8,
                     jnp.float32(0.5))[0][:1, :1],
        reps=4,
    )
    print(f"fuse_views 8v: {t_fuse / NV:.2f} ms/view")

    @functools.partial(jax.jit, static_argnames=("e_cap",))
    def render_only(v, f, rot8, trans8, fl8, pp8, *, e_cap):
        def step(acc, view):
            r, t, fl_, pp_ = view
            tri, z, ov = dense.rasterize(
                v, f, r, t, fl_, pp_, height=H, width=W,
                e_cap_rows=e_cap[0], micro_cap_rows=e_cap[1],
            )
            return acc + jnp.sum(tri[::64, ::64]) + ov, None
        acc, _ = jax.lax.scan(
            step, jnp.int32(0), (rot8, trans8, fl8, pp8)
        )
        return acc

    t_r = timed(
        lambda: render_only(v, f, rot8, trans8, fl8, pp8, e_cap=caps8),
        reps=4,
    )
    print(f"render-only scan 8v: {t_r / NV:.2f} ms/view "
          f"(fusion marginal: {(t_fuse - t_r) / NV:.2f} ms/view)")


if __name__ == "__main__":
    main()
