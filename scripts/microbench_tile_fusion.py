#!/usr/bin/env python3
"""Validate the tile-structured fusion reduce at the scannet preset (TPU).

The fused render+accumulate step's segment sum currently scatters one row
PER PIXEL (1.25M rows x 41 f32 cols at the scannet preset, ~50 ms — the
co-dominant cost of the step, scripts/microbench_scannet.py). But the
dense rasterizer's binning already knows which <= kmax candidate
triangles can own each (16, 128) screen tile, so the reduce can run in
two levels:

  1. per-tile partial sums: one-hot(tile candidate ids == tile idx image)
     contracted against the tile's prob rows on the MXU — XLA fuses the
     compare into the dot operands (same measured fact as the small-P
     MXU segment sum: no (B, kmax, 2048) one-hot ever hits HBM);
  2. one scatter of the CANDIDATE partial rows (~214k incl. 2x budget
     margin) instead of the pixel rows (1.25M).

This script measures both on the real scene + rendered image and checks
numeric agreement. kmax distribution is reported because the einsum pads
every tile to the max candidate count.
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
from semantic_meshes import ops

SUB, W, H, C = 91, 1296, 968, 40
REPS = 20
TILE_H, TILE_W = dense.TILE_H, dense.TILE_W


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def tile_view(img, nby, nbx, hp, wp):
    """(H, W, ...) -> (B, TILE_H*TILE_W, ...) padded tile raster."""
    pad = [(0, hp - img.shape[0]), (0, wp - img.shape[1])] + [
        (0, 0)
    ] * (img.ndim - 2)
    x = jnp.pad(img, pad)
    x = x.reshape((nby, TILE_H, nbx, TILE_W) + img.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((nby * nbx, TILE_H * TILE_W) + img.shape[2:])


def main():
    vertices, faces = testing.make_cube(subdivisions=SUB)
    cams = testing.make_ring_cameras(num_views=1, width=W, height=H)
    rot, trans, fl, pp = stack_cameras(cams)
    v, f = jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32)
    args = jax.device_put((v, f, rot[0], trans[0], fl[0], pp[0]))
    rng = np.random.default_rng(0)
    P = len(faces)
    data = jax.device_put(
        jnp.asarray(rng.random((H, W, C + 1), np.float32))
    )  # probs + count column, pre-weighted

    stats = np.asarray(dense.candidate_stats(*args, height=H, width=W))
    pairs = int(stats[0])
    e_cap = 2 * pairs
    print(f"pairs={pairs} micro={int(stats[1])} P={P}")

    idx_img, _z, _ov = dense.rasterize(
        *args, height=H, width=W, e_cap_rows=e_cap,
        micro_cap_rows=2 * int(stats[1]),
    )
    idx_img = jax.device_put(jnp.asarray(idx_img))

    # --- baseline: flat per-pixel row scatter (current fusion path)
    @jax.jit
    def flat(idx_img, data):
        idx = idx_img.reshape(-1)
        return ops.segment_sum(
            data.reshape(-1, C + 1), idx, P, method="float32"
        )

    t_flat = timed(flat, idx_img, data)
    print(f"flat f32 pixel-row scatter: {t_flat:.2f} ms")
    ref = np.asarray(flat(idx_img, data))

    # --- tile path: reuse the binning
    nby, nbx = -(-H // TILE_H), -(-W // TILE_W)
    B = nby * nbx
    cap_r = -(-max(e_cap, dense.CHUNK) // dense.CHUNK) * dense.CHUNK

    @functools.partial(jax.jit, static_argnames=("e_cap",))
    def bins(v, f, r, t, fl_, pp_, *, e_cap):
        setup = xr._make_setup(v, f, r, t, fl_, pp_, None, False)
        tri_sorted, starts, overflow, micro = dense._build_sorted_bins(
            setup, H, W, jnp.float32(0), e_cap, 1024
        )
        return tri_sorted, starts

    tri_sorted, starts = bins(*args, e_cap=cap_r)
    counts = np.diff(np.asarray(starts))[:B]
    print(
        f"per-tile candidates: max={counts.max()} p99={int(np.percentile(counts, 99))} "
        f"mean={counts.mean():.0f} B={B}"
    )
    kmax = int(counts.max())
    kmax_r = -(-kmax // 8) * 8

    @functools.partial(jax.jit, static_argnames=("kmax",))
    def tile_reduce(idx_img, data, tri_sorted, starts, *, kmax):
        E = tri_sorted.shape[0]
        pos = jnp.arange(E, dtype=jnp.int32)
        tile_of = jnp.searchsorted(
            starts[1:B + 1], pos, side="right"
        ).astype(jnp.int32)
        slot = pos - starts[tile_of]
        in_tile = (tile_of < B) & (slot < kmax)
        # (B, kmax) candidate-id table; empty slots stay -2 (match nothing)
        table = jnp.full((B, kmax), -2, jnp.int32)
        table = table.at[
            jnp.where(in_tile, tile_of, B),
            jnp.where(in_tile, slot, 0),
        ].set(tri_sorted, mode="drop")

        hp, wp = nby * TILE_H, nbx * TILE_W
        idxt = tile_view(idx_img, nby, nbx, hp, wp)      # (B, pix)
        datat = tile_view(data, nby, nbx, hp, wp)        # (B, pix, C+1)
        onehot = (
            table[:, :, None] == idxt[:, None, :]
        ).astype(jnp.float32)                            # (B, kmax, pix)
        partials = jax.lax.dot_general(
            onehot, datat,
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )                                                # (B, kmax, C+1)
        # back to the compact sorted layout, then one candidate-row scatter
        part_sorted = partials[
            jnp.where(in_tile, tile_of, 0),
            jnp.where(in_tile, slot, 0),
        ]
        part_sorted = jnp.where(in_tile[:, None], part_sorted, 0.0)
        safe = jnp.where(in_tile & (tri_sorted < P), tri_sorted, P)
        acc = jnp.zeros((P + 1, C + 1), jnp.float32)
        acc = acc.at[safe].add(part_sorted, mode="drop")
        return acc[:P]

    t_tile = timed(
        functools.partial(tile_reduce, kmax=kmax_r),
        idx_img, data, tri_sorted, starts,
    )
    print(f"tile einsum + candidate-row scatter (kmax={kmax_r}): {t_tile:.2f} ms")

    # --- two-class variant: the kmax=max padding loses because tile
    # candidate counts are heavily skewed (mean ~160, max ~3k). Tiles
    # with <= KTILE candidates ride the einsum (bounded padding); the few
    # heavier tiles scatter ALL their pixel rows directly (tile-coherent
    # gather, ~2048 rows each). Exact: a light tile's stream-won pixels
    # are covered by its own candidate list; heavy tiles' pixels carry
    # their winners pixel-wise whoever they are.
    KTILE = 256
    n_heavy = int((counts > KTILE).sum())
    heavy_cap = max(2 * n_heavy, 4)
    print(f"heavy tiles (> {KTILE} candidates): {n_heavy}")

    @functools.partial(jax.jit, static_argnames=("ktile", "heavy_cap"))
    def tile_reduce2(idx_img, data, tri_sorted, starts, *, ktile,
                     heavy_cap):
        E = tri_sorted.shape[0]
        pos = jnp.arange(E, dtype=jnp.int32)
        tile_of = jnp.searchsorted(
            starts[1:B + 1], pos, side="right"
        ).astype(jnp.int32)
        slot = pos - starts[tile_of]
        tcounts = starts[1:B + 1] - starts[:B]
        heavy = tcounts > ktile  # (B,)
        in_tile = (tile_of < B) & (slot < ktile) & ~heavy[
            jnp.minimum(tile_of, B - 1)
        ]
        table = jnp.full((B, ktile), -2, jnp.int32)
        table = table.at[
            jnp.where(in_tile, tile_of, B),
            jnp.where(in_tile, slot, 0),
        ].set(tri_sorted, mode="drop")

        hp, wp = nby * TILE_H, nbx * TILE_W
        idxt = tile_view(idx_img, nby, nbx, hp, wp)      # (B, pix)
        datat = tile_view(data, nby, nbx, hp, wp)        # (B, pix, C+1)
        onehot = (
            table[:, :, None] == idxt[:, None, :]
        ).astype(jnp.float32)                            # (B, ktile, pix)
        partials = jax.lax.dot_general(
            onehot, datat,
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )                                                # (B, ktile, C+1)
        acc = jnp.zeros((P + 1, C + 1), jnp.float32)
        safe_tid = jnp.where(table >= 0, table, P)
        acc = acc.at[safe_tid.reshape(-1)].add(
            partials.reshape(-1, C + 1), mode="drop"
        )
        # heavy tiles: compact list, scatter every pixel row
        hsort = jnp.argsort(jnp.where(heavy, 0, 1))[:heavy_cap]
        hvalid = heavy[hsort]
        hidx = jnp.where(hvalid[:, None], idxt[hsort], -1)  # (Hc, pix)
        hdata = datat[hsort]                                # (Hc, pix, C+1)
        hprim = jnp.where(
            (hidx >= 0) & (hidx < P), hidx, P
        ).reshape(-1)
        acc = acc.at[hprim].add(
            hdata.reshape(-1, C + 1), mode="drop"
        )
        dropped_heavy = jnp.maximum(
            jnp.sum(heavy.astype(jnp.int32)) - heavy_cap, 0
        )
        return acc[:P], dropped_heavy

    t_tile2 = timed(
        functools.partial(tile_reduce2, ktile=KTILE, heavy_cap=heavy_cap),
        idx_img, data, tri_sorted, starts,
    )
    print(f"two-class tile reduce (ktile={KTILE}, heavy_cap={heavy_cap}): "
          f"{t_tile2:.2f} ms")
    got2, dh = tile_reduce2(
        idx_img, data, tri_sorted, starts, ktile=KTILE, heavy_cap=heavy_cap
    )
    got2 = np.asarray(got2)
    assert int(dh) == 0

    @functools.partial(jax.jit, static_argnames=("ktile",))
    def masked_flat(idx_img, data, tri_sorted, starts, *, ktile):
        """Oracle restricted to the pixels tile_reduce2 accounts for:
        light-tile pixels whose winner is in the tile's candidate list,
        plus every heavy-tile pixel."""
        E = tri_sorted.shape[0]
        pos = jnp.arange(E, dtype=jnp.int32)
        tile_of = jnp.searchsorted(
            starts[1:B + 1], pos, side="right"
        ).astype(jnp.int32)
        slot = pos - starts[tile_of]
        tcounts = starts[1:B + 1] - starts[:B]
        heavy = tcounts > ktile
        in_tile = (tile_of < B) & (slot < ktile) & ~heavy[
            jnp.minimum(tile_of, B - 1)
        ]
        table = jnp.full((B, ktile), -2, jnp.int32)
        table = table.at[
            jnp.where(in_tile, tile_of, B),
            jnp.where(in_tile, slot, 0),
        ].set(tri_sorted, mode="drop")
        hp, wp = nby * TILE_H, nbx * TILE_W
        idxt = tile_view(idx_img, nby, nbx, hp, wp)
        datat = tile_view(data, nby, nbx, hp, wp)
        covered = jnp.any(
            table[:, :, None] == idxt[:, None, :], axis=1
        ) | heavy[:, None]
        prim = jnp.where(covered & (idxt >= 0) & (idxt < P), idxt, P)
        acc = jnp.zeros((P + 1, C + 1), jnp.float32)
        acc = acc.at[prim.reshape(-1)].add(
            datat.reshape(-1, C + 1), mode="drop"
        )
        return acc[:P]

    ref2 = np.asarray(
        masked_flat(idx_img, data, tri_sorted, starts, ktile=KTILE)
    )
    err2 = np.abs(got2 - ref2)
    rel2 = err2 / np.maximum(np.abs(ref2), 1e-3)
    print(f"two-class agreement vs masked oracle: "
          f"max abs={err2.max():.3e} max rel={rel2.max():.3e}")

    got = np.asarray(
        tile_reduce(idx_img, data, tri_sorted, starts, kmax=kmax_r)
    )
    # tile path misses pixels won by micro/global triangles — compare on
    # rows fully owned by binned candidates
    covered = np.unique(np.asarray(tri_sorted))
    covered = covered[(covered >= 0) & (covered < P)]
    err = np.abs(got[covered] - ref[covered])
    rel = err / np.maximum(np.abs(ref[covered]), 1e-3)
    print(f"agreement on {len(covered)} binned rows: "
          f"max abs={err.max():.3e} max rel={rel.max():.3e}")
    miss = np.setdiff1d(np.nonzero(ref.any(1))[0], covered)
    print(f"rows needing micro/global legs: {len(miss)}")


if __name__ == "__main__":
    main()
