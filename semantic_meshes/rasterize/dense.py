"""Dense-mesh rasterizer (v2): sort-based binning + HBM-streaming kernel.

The v1 path (pallas_kernel.py) builds a static (tiles x N) candidate table
via an overlap matrix + top_k. That is O(tiles * triangles) in time and
memory and caps candidates per tile — at ScanNet scale (millions of tiny
triangles) it overflows and the binning dominates.

v2 replaces it with the classic sort-based pipeline, all static shapes:

  1. span: each triangle's tile-bbox on a (TILE_H, TILE_W)-pixel tile grid
     (default (16, 128); see the granularity ablations below).
     Triangles spanning <= 2x2 tiles ("small", the overwhelming majority of
     a dense mesh) emit up to 4 (tile, triangle) pairs; larger triangles
     emit one pair in a shared "global" bucket that every tile also tests
     (capped at n_global; drops counted in overflow).
  2. ONE stable int32 sort of all pairs by tile id (payload: triangle id);
     tri-major emission + stable sort => ascending triangle ids within each
     tile, preserving the deterministic lowest-index tie-break.
  3. per-tile [start, end) ranges via searchsorted; candidate parameter rows
     gathered once into sorted order, packed 8 candidates per 128-lane row
     (in-kernel scalar reads must be [dynamic sublane, static lane]).
  4. Pallas kernel: grid over tiles; each step streams its own range and the
     global range of the packed table from HBM into VMEM scratch in chunks
     and z-resolves against the tile entirely on-chip.

Same output contract as rasterize.xla.rasterize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import xla as xla_rast
from .pallas_kernel import _ID_BIAS, _N_PARAMS, _gather_candidate_tables

import os

# (16, 128) tiles. Three finer-granularity variants were measured SLOWER
# at the scannet preset and rejected:
# - an (8, 128) tile GRID (the f32 VPU minimum): 32.1 vs 29.8 ms/view —
#   halves each candidate's VPU work but doubles the per-tile DMA issue
#   + loop scaffolding (kernel is ~half overhead at ~100 cands/tile);
# - a per-candidate HALF-TILE test (round 3: class 0/1/2 = bbox in the
#   top (8,128) half / bottom half / both, carried in param lane 13,
#   selected by nested scalar lax.cond in the candidate loop): 12.9 vs
#   25.5 MPix/s END TO END — a 2x REGRESSION; Mosaic's per-candidate
#   scalar branching costs far more than the (8,128) vreg work it skips;
# - BRANCH-FREE half-tile ranges (round 3: same (16, 128) grid, binning
#   sort key = tile * 3 + class so each tile gets pre-sorted top-only /
#   bottom-only / spans-both ranges, single-half ranges tested on an
#   (8, 128) block with two (8, 128) z-carries): render-only 8-view scan
#   20.4 vs 19.1 ms/view same-session — the 2 extra DMA ranges + loop
#   scaffolding per tile cost more than the ~35% VPU saving, which the
#   scan's phase overlap already hides. The per-candidate test work is
#   NOT the in-pipeline bottleneck at ~160 candidates/tile.
# The COARSER direction ties (round 3, closing the axis): a (32, 128)
# grid halves the per-tile scaffolding and emits 6.5% fewer pairs
# (99.7k vs 106.7k at the scannet preset) but measures a dead tie
# in-pipeline — render-only 8-view scan 19.28 vs 19.21 ms/view, fused
# 40.45 vs 40.46 (same session, microbench_scannet.py) — and the dense
# preset is all-micro (zero candidates), so the grid is irrelevant
# there. (16, 128) stays; SM_DENSE_TILE_H/W remain as ablation knobs
# (any multiple of 8 x multiple of 128; bit-parity verified at 32).
TILE_H = int(os.environ.get("SM_DENSE_TILE_H", "16"))
TILE_W = int(os.environ.get("SM_DENSE_TILE_W", "128"))
if TILE_H <= 0 or TILE_H % 8 or TILE_W <= 0 or TILE_W % 128:
    # fail at import with a named error, not 30-130 s later inside the
    # tunneled compile service with a cryptic Mosaic block-shape error
    raise ValueError(
        f"SM_DENSE_TILE_H must be a positive multiple of 8 and "
        f"SM_DENSE_TILE_W a positive multiple of 128 (f32 Pallas block "
        f"minimum); got ({TILE_H}, {TILE_W})"
    )
# Micro/streaming routing threshold: triangles whose pixel-center bbox is
# <= MICRO_MAX x MICRO_MAX ride the fragment path (MICRO_MAX^2 fragment
# slots each); larger ones are tile-binned for the streaming kernel.
# Raising it trades streaming-kernel per-candidate work (a full-tile VPU
# test per (tile, triangle) pair) for fragment-sort rows (~7.5 ns/row
# across the two z-resolve sorts — the same figure ROUTE_BETA encodes
# below) — measure at the scannet preset before changing
# (scripts/microbench_scannet.py prints the per-threshold routing curve).
# Also a static `micro_max` argument on rasterize() and the probes so an
# A/B needs no reimport.
#
# SM_MICRO_MAX=auto (the DEFAULT since round 5): the RENDERERS pick the
# threshold per resolution from the same one-sync probe that sizes the
# candidate budgets, minimizing the linear cost model below
# (pick_micro_max). No single fixed value serves every scene: the
# scannet-preset mesh bins 107k (tile, triangle) pairs at threshold 2
# but only 2.5k at 4, while the dense-preset mesh is all-micro at 2
# already, so raising its threshold only multiplies fragment-sort rows.
# Promotion basis: the round-4 in-pipeline re-fit (alpha=97, beta=7.05,
# solved exactly from scannet e2e at m=2/3/4 = 45.53/44.72/46.51
# ms/view) picks the measured winner m=3 at scannet (+1.8%) and the
# already-optimal point everywhere else (every other preset is
# routing-degenerate). Set SM_MICRO_MAX=<int> to pin the old fixed
# routing; routing is output-invariant either way (oracle bit-parity
# asserted at thresholds 1/2/4/6 in tests).
_mm_env = os.environ.get("SM_MICRO_MAX", "auto")
MICRO_AUTO = _mm_env.strip().lower() == "auto"
try:
    MICRO_MAX = 2 if MICRO_AUTO else int(_mm_env)
except ValueError:
    raise ValueError(
        f"SM_MICRO_MAX must be 'auto' or an integer in [1, 8]; got "
        f"{_mm_env!r}"
    ) from None
if not 1 <= MICRO_MAX <= 8:
    raise ValueError(
        f"SM_MICRO_MAX must be 'auto' or in [1, 8] (fragment slots are "
        f"its square; beyond 8 the fragment sorts dwarf any streaming "
        f"saving); got {MICRO_MAX}"
    )


def _check_micro_max(micro_max):
    """Shared [1, 8] bound for the explicit micro_max argument (the env
    knob is validated at import; 0 would silently emit zero fragment
    slots and drop every micro triangle)."""
    if micro_max is not None and not 1 <= int(micro_max) <= 8:
        raise ValueError(f"micro_max must be in [1, 8]; got {micro_max}")

# Thresholds the auto mode considers, and the cost model's coefficients
# (nanoseconds; env-tunable for recalibration on other TPU generations):
# alpha = per (tile, triangle) pair (streaming kernel full-tile test +
# packed-table gather), beta = per fragment-sort row (two 3-operand sorts
# + slot arithmetic), gamma = per binning-sort row, paid only while any
# pairs exist (pairs == 0 skips binning + kernel entirely).
#
# alpha/beta defaults are the round-4 IN-PIPELINE fit: the scannet-preset
# e2e bench at fixed SM_MICRO_MAX=2/3/4 measured 45.53/44.72/46.51
# ms/view (region minimum, v5e, same session); with the preset's exact
# counts (pairs 106727/44160/11975, margin-capped fragment rows
# 150392/894348/1589952, binning rows constant at 496860) the three
# equations solve exactly to alpha = 97, beta = 7.05 — within 10% of the
# standalone-phase estimates (88, 7.5), so the linear model survives
# XLA's in-pipeline overlap. Under the fit the model reproduces the
# measured ordering (picks 3 at scannet; every other preset shape is
# routing-degenerate: small/default/large have zero micro triangles,
# dense is all-micro at every threshold). gamma is NOT identifiable from
# those runs (pairs > 0 in all three, so the binning term is constant)
# and keeps its standalone estimate; it only prices the pairs == 0
# binning-skip credit.
ROUTING_THRESHOLDS = (2, 3, 4, 5)
ROUTE_ALPHA = float(os.environ.get("SM_ROUTE_ALPHA", "97"))
ROUTE_BETA = float(os.environ.get("SM_ROUTE_BETA", "7.05"))
ROUTE_GAMMA = float(os.environ.get("SM_ROUTE_GAMMA", "7"))

K_SPAN = 5  # 4 span slots + 1 global-bucket slot per triangle
PACK = 8  # candidates per 128-lane row of the packed parameter table
CHUNK_ROWS = 32  # packed rows per DMA (= 256 candidates)
CHUNK = PACK * CHUNK_ROWS
_ALIGN = PACK * 8  # candidate alignment of DMA-able range starts


def _cdiv(a, b):
    return -(-a // b)


def _classify(setup, height, width, y_offset, micro_max=None,
              micro_split=None):
    """Shared span/micro/big triangle classification for binning and for
    the closed-form candidate count probe.

    micro_split: static row index k — rows [0, k) are "uni" candidates
    (fragment path with ONE slot, so their micro bound is bbox <= 1x1
    regardless of micro_max); a uni row whose bbox exceeds 1x1 in this
    view falls through to the small/big (streaming kernel) classes,
    keeping the output exact when the caller's uni ordering was probed on
    other views. See rasterize()'s micro_split docstring."""
    nby = _cdiv(height, TILE_H)
    nbx = _cdiv(width, TILE_W)

    ymin = setup["ymin"] - y_offset
    ymax = setup["ymax"] - y_offset
    bx0 = jnp.clip(jnp.floor(setup["xmin"] / TILE_W).astype(jnp.int32), 0, nbx - 1)
    bx1 = jnp.clip(jnp.floor(setup["xmax"] / TILE_W).astype(jnp.int32), 0, nbx - 1)
    by0 = jnp.clip(jnp.floor(ymin / TILE_H).astype(jnp.int32), 0, nby - 1)
    by1 = jnp.clip(jnp.floor(ymax / TILE_H).astype(jnp.int32), 0, nby - 1)
    onscreen = (
        (setup["xmax"] >= 0)
        & (setup["xmin"] < width)
        & (ymax >= 0)
        & (ymin < height)
    )
    valid = setup["valid"] & onscreen
    span_h = by1 - by0 + 1
    span_w = bx1 - bx0 + 1
    # micro triangles (pixel-bbox covering <= micro_max^2 pixel centers) are
    # resolved on the fragment path — testing them against whole tiles would
    # waste ~2000x VPU work on a dense mesh where most triangles are sub-pixel
    micro = valid & _is_micro(setup, y_offset, micro_max)
    if micro_split is not None:
        # uni rows get one fragment slot: only bbox <= 1x1 qualifies;
        # larger uni rows ride the streaming kernel instead (exactness
        # over speed for ordering misses)
        _, _, nx, ny = _micro_pixel_range(setup)
        uni = (
            jnp.arange(micro.shape[0], dtype=jnp.int32) < int(micro_split)
        )
        micro = micro & (~uni | ((nx <= 1) & (ny <= 1)))
    small = valid & ~micro & (span_h <= 2) & (span_w <= 2)
    big = valid & ~micro & ~small
    return micro, small, big, bx0, by0, span_h, span_w


def _pair_count(small, big, span_h, span_w):
    """Exact (tile, triangle) pair count the binning will emit for a
    _classify result — the ONE definition both probes and the zero-budget
    fast path share (a drift here would under-size budgets silently)."""
    span_pairs = jnp.where(small, span_h * span_w, 0)
    return (jnp.sum(span_pairs) + jnp.sum(big.astype(jnp.int32))).astype(
        jnp.int32
    )


def count_pairs(setup, height, width, y_offset, micro_max=None,
                micro_split=None):
    """Exact (tile, triangle) pair count the dense binning will produce —
    closed form, no sort. The right-sizing probe for `e_cap_rows`: the
    packed-table gather costs per ROW of the static e_cap budget, and on
    micro-heavy meshes the default 3-rows-per-triangle budget is almost
    entirely sentinel padding (100% at a 2M-triangle bench view)."""
    micro, small, big, _, _, span_h, span_w = _classify(
        setup, height, width, y_offset, micro_max, micro_split
    )
    return _pair_count(small, big, span_h, span_w)


def _build_sorted_bins(setup, height, width, y_offset, e_cap, n_global,
                       micro_max=None, micro_split=None):
    """Returns (tri_sorted (e_cap + CHUNK,), starts (B + 2,), overflow, micro).

    starts indexes the sorted pair array: tile b's candidates are
    [starts[b], starts[b+1]); the global (big-triangle) bucket is
    [starts[B], starts[B+1]). overflow counts BOTH pairs clamped by the
    e_cap budget AND big triangles beyond the n_global cap (the kernel
    clamps its global range to n_global — see _make_dense_kernel — so
    uncounted drops there would silently render the wrong surface).
    """
    T = setup["denom"].shape[0]
    nby = _cdiv(height, TILE_H)
    nbx = _cdiv(width, TILE_W)
    B = nby * nbx

    micro, small, big, bx0, by0, span_h, span_w = _classify(
        setup, height, width, y_offset, micro_max, micro_split
    )

    # pair expansion: slots 0..3 -> span cells (small tris); slot 4 -> the
    # shared global bucket (big tris); everything else -> sentinel B+1
    ks = jnp.arange(4, dtype=jnp.int32)
    dy = ks // 2
    dx = ks % 2
    cell_y = by0[:, None] + dy[None, :]
    cell_x = bx0[:, None] + dx[None, :]
    in_span = (dy[None, :] < span_h[:, None]) & (dx[None, :] < span_w[:, None])
    span_tiles = jnp.where(
        small[:, None] & in_span, cell_y * nbx + cell_x, B + 1
    ).astype(jnp.int32)  # (T, 4)
    global_tile = jnp.where(big, B, B + 1).astype(jnp.int32)[:, None]
    tile_ids = jnp.concatenate([span_tiles, global_tile], axis=1)  # (T, 5)
    tri_ids = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, K_SPAN)
    )
    tiles_sorted, tri_sorted = jax.lax.sort(
        (tile_ids.reshape(-1), tri_ids.reshape(-1)),
        dimension=0,
        is_stable=True,
        num_keys=1,
    )
    starts = jnp.searchsorted(
        tiles_sorted, jnp.arange(B + 2, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    total_pairs = starts[B + 1]
    overflow = jnp.maximum(total_pairs - e_cap, 0)
    starts = jnp.minimum(starts, e_cap)
    # big triangles past the kernel's n_global clamp are dropped there;
    # count them (post-e_cap-clamp, so the two clamps don't double-count)
    overflow = overflow + jnp.maximum(
        (starts[B + 1] - starts[B]) - n_global, 0
    )

    # clamp/pad the sorted ids to e_cap + CHUNK rows (sentinel T): chunked
    # DMAs may overshoot a partial final chunk, so carry one chunk of slack
    padded_len = e_cap + CHUNK
    tri_sorted = tri_sorted[:padded_len]
    if tri_sorted.shape[0] < padded_len:
        tri_sorted = jnp.pad(
            tri_sorted, (0, padded_len - tri_sorted.shape[0]),
            constant_values=T,
        )
    return tri_sorted, starts, overflow, micro


def _compact_micro(setup, micro, cap):
    """Gather the micro-triangle rows of `setup` into a cap-row prefix.

    The fragment path emits micro_max^2 slots per row of whatever array
    it is given; without compaction that is micro_max^2 * T sort rows
    even when only a few thousand triangles are micro (the scannet
    regime at the default threshold: 8.7k micro of 99k tris — 96% of the
    fragment-sort rows were sentinels). One stable
    (not-micro, id) sort puts the micro ids first in ascending order
    (preserving the deterministic lowest-index tie-break), rows past the
    cap are dropped INTO THE OVERFLOW COUNTER, never silently.

    Returns (sub_setup, tri_ids (cap,), valid (cap,), dropped_count).
    """
    T = micro.shape[0]
    ids = jnp.arange(T, dtype=jnp.int32)
    not_micro = jnp.where(micro, 0, 1).astype(jnp.int32)
    _, ids_sorted = jax.lax.sort(
        (not_micro, ids), dimension=0, is_stable=True, num_keys=1
    )
    take = ids_sorted[:cap]
    n_micro = jnp.sum(micro.astype(jnp.int32))
    valid = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(n_micro, cap)
    dropped = jnp.maximum(n_micro - cap, 0).astype(jnp.int32)
    sub = {
        k: setup[k][take]
        for k in ("a", "b", "c", "az", "bz", "cz", "denom",
                  "xmin", "xmax", "ymin", "ymax")
    }
    return sub, take, valid, dropped


def _micro_pixel_range(setup):
    """First covered pixel-center (ix0, iy0) and center counts (nx, ny) of
    each triangle's bbox. Pixel centers are at integer + 0.5."""
    ix0 = jnp.ceil(setup["xmin"] - 0.5).astype(jnp.int32)
    iy0 = jnp.ceil(setup["ymin"] - 0.5).astype(jnp.int32)
    nx = jnp.floor(setup["xmax"] - 0.5).astype(jnp.int32) - ix0 + 1
    ny = jnp.floor(setup["ymax"] - 0.5).astype(jnp.int32) - iy0 + 1
    return ix0, iy0, nx, ny


def _is_micro(setup, y_offset, micro_max=None):
    del y_offset  # bbox classification is band-independent
    m = MICRO_MAX if micro_max is None else int(micro_max)
    _, _, nx, ny = _micro_pixel_range(setup)
    return (nx <= m) & (ny <= m)


def _rasterize_micro(setup, micro, height, width, y_offset, tri_ids=None,
                     micro_max=None, micro_split=None):
    """Fragment path for micro triangles — scatter-free.

    tri_ids: optional (T,) int32 of the ORIGINAL triangle ids of the rows
    in `setup` (the compacted-micro path passes a gathered subset; default
    is row index == triangle id).

    Emit <= micro_max^2 per-pixel fragments per micro triangle PLUS one background
    fragment per pixel (z = +inf, tri = sentinel), z-resolve with one
    unstable 3-key sort by (pixel, zbits, tri) — lowest triangle id wins
    ties by construction — and compact with a second 3-key sort keyed on
    (winner ? pixel : HW): because every pixel owns exactly one winner
    (the background fragment guarantees presence), the first H*W compacted
    rows ARE the image in pixel order, so the result is a reshape. This
    replaces the previous set-scatter image build, which dominated the
    micro path on TPU (sorts are ~7.5 ms per 2M rows; an image-sized
    set-scatter is ~25 ms+ — scripts/microbench_scatter2.py).

    Returns (z (H, W) f32 with +inf empty, idx (H, W) int32 with -1 empty).
    """
    T = setup["denom"].shape[0]
    HW = height * width
    mm = MICRO_MAX if micro_max is None else int(micro_max)
    nslots = mm * mm
    if tri_ids is None:
        tri_ids = jnp.arange(T, dtype=jnp.int32)

    def emit_slots(sub, sub_micro, slots):
        """(pix, zbits) fragment arrays for the given slot offsets over a
        row slice of the setup — pure elementwise work."""
        ix0, iy0, _, _ = _micro_pixel_range(sub)
        pixs, keys = [], []
        for dy, dx in slots:
            ix = ix0 + dx
            iy_local = (iy0 + dy) - y_offset.astype(jnp.int32)
            pxc = ix.astype(jnp.float32) + 0.5
            pyc = (iy0 + dy).astype(jnp.float32) + 0.5
            w0 = sub["a"][:, 0] * pxc + sub["b"][:, 0] * pyc + sub["c"][:, 0]
            w1 = sub["a"][:, 1] * pxc + sub["b"][:, 1] * pyc + sub["c"][:, 1]
            w2 = sub["a"][:, 2] * pxc + sub["b"][:, 2] * pyc + sub["c"][:, 2]
            sgn = jnp.sign(sub["denom"])
            inside = (w0 * sgn >= 0) & (w1 * sgn >= 0) & (w2 * sgn >= 0)
            inv_z = sub["az"] * pxc + sub["bz"] * pyc + sub["cz"]
            ok = (
                sub_micro
                & inside
                & (inv_z > 0)
                & (ix >= 0) & (ix < width)
                & (iy_local >= 0) & (iy_local < height)
            )
            z = 1.0 / inv_z
            zbits = jax.lax.bitcast_convert_type(z, jnp.int32)  # z>0: mono
            pixs.append(jnp.where(ok, iy_local * width + ix, HW))
            keys.append(zbits)
        return pixs, keys

    all_slots = [(s // mm, s % mm) for s in range(nslots)]
    if micro_split is None or int(micro_split) <= 0:
        pix_list, key_list = emit_slots(setup, micro, all_slots)
        tri_cat = jnp.tile(tri_ids, nslots)
        n_frag = nslots * T
    else:
        # uni-slot prefix: rows [0, k) contribute slot (0, 0) only (their
        # micro flag already requires bbox <= 1x1); rows [k, T) get the
        # full slot grid. Static slicing — no gathers.
        k = min(int(micro_split), T)
        tail = {
            key: setup[key][k:]
            for key in ("a", "b", "c", "az", "bz", "cz", "denom",
                        "xmin", "xmax", "ymin", "ymax")
        }
        pix_list, key_list = emit_slots(setup, micro, all_slots[:1])
        tp, tk = emit_slots(tail, micro[k:], all_slots[1:])
        pix_list += tp
        key_list += tk
        tri_cat = jnp.concatenate(
            [tri_ids] + [tri_ids[k:]] * (nslots - 1)
        ) if nslots > 1 else tri_ids
        n_frag = T + (nslots - 1) * (T - k)

    if n_frag * 2 >= HW:
        # fragment count rivals the pixel count (the dense regime): append
        # one background fragment per pixel so the compaction sort emits
        # exactly one winner per pixel — the image is then a reshape, no
        # scatter. Sorts are cheap (~4 ns/row), image-sized set-scatters
        # are not (~30 ns/row) — scripts/microbench_scatter2.py.
        bg_tri = jnp.int32(2**31 - 1)
        pix = jnp.concatenate(
            pix_list + [jnp.arange(HW, dtype=jnp.int32)]
        )
        zbits = jnp.concatenate(
            key_list + [jnp.full((HW,), jnp.int32(0x7F800000))]  # +inf
        )
        tri = jnp.concatenate([tri_cat, jnp.full((HW,), bg_tri)])
        # z-resolve: (pixel, z, tri) — tri in the keys gives the
        # deterministic lowest-index tie-break on equal depth
        pix_s, z_s, tri_s = jax.lax.sort(
            (pix, zbits, tri), dimension=0, is_stable=False, num_keys=3
        )
        first = jnp.concatenate(
            [jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]]
        ) & (pix_s < HW)
        # compact: exactly HW winners (one per pixel), pixel-ascending.
        # Measured alternative (round 3): carry only a ROW-INDEX payload
        # here (2 int32 operands instead of 3) and gather z/tri at the HW
        # winning rows afterwards — rasterize_micro 36.8 vs 16.4 ms at the
        # dense preset. The winner rows ascend but stride ~(4T+HW)/HW
        # apart, so the two 786k-row gathers from 2.8M-row arrays pay the
        # random-gather rate and swamp the ~1/3 sort-byte saving. Keep all
        # three operands in the sort.
        _, wz, wtri = jax.lax.sort(
            (jnp.where(first, pix_s, HW), z_s, tri_s),
            dimension=0,
            is_stable=False,
            num_keys=3,
        )
        z_img = jax.lax.bitcast_convert_type(wz[:HW], jnp.float32)
        idx_img = jnp.where(jnp.isinf(z_img), -1, wtri[:HW])
        return z_img.reshape(height, width), idx_img.reshape(height, width)

    # few fragments relative to the image (big tiles/small mesh on the
    # dense path): sort only the nslots*T fragments and build the image with
    # one <=nslots*T-row sorted set-scatter instead of paying O(HW log HW)
    # sorts
    pix = jnp.concatenate(pix_list)
    zbits = jnp.concatenate(key_list)
    tri = tri_cat
    pix_s, z_s, tri_s = jax.lax.sort(
        (pix, zbits, tri), dimension=0, is_stable=False, num_keys=3
    )
    first = jnp.concatenate(
        [jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]]
    ) & (pix_s < HW)
    wpix, wz, wtri = jax.lax.sort(
        (jnp.where(first, pix_s, HW), z_s, tri_s),
        dimension=0,
        is_stable=False,
        num_keys=3,
    )
    cap = min(wpix.shape[0], HW)
    wpix, wz, wtri = wpix[:cap], wz[:cap], wtri[:cap]
    vals = jnp.stack([wz, wtri], axis=-1)  # (cap, 2)
    img = jnp.full((HW, 2), jnp.int32(0x7F800000))  # +inf bits / marker
    img = img.at[wpix].set(
        vals, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    z_img = jax.lax.bitcast_convert_type(img[:, 0], jnp.float32)
    idx_img = jnp.where(jnp.isinf(z_img), -1, img[:, 1])
    return z_img.reshape(height, width), idx_img.reshape(height, width)


def _candidate_test(p, px, py, invz, idx):
    """Shared z-test body: p(k) reads scalar param k of the candidate.

    Pre-signed edge forms + inverse-z buffer (init 0 = empty): see
    pallas_kernel._raster_kernel — no per-candidate sign multiply or
    reciprocal; finalize z = 1/invz once per tile.

    Tie semantics: strictly-greater inv_z wins, so equal-inv_z candidates
    resolve to the earliest (lowest-id) one — deterministic. Cross-backend
    caveat: the xla oracle compares z = 1/inv_z instead, so two DISTINCT
    inv_z values whose f32 reciprocals collide tie there (lowest id wins)
    but not here; and Mosaic may fuse the inv_z multiply-adds differently
    (ulp-level value differences). Winner identity therefore matches the
    oracle only when depths are separated beyond ulp noise — true for real
    scenes and all test scenes; per-backend determinism is the contract
    (the CUDA reference is nondeterministic on ANY tie, MIGRATION.md)."""
    w0 = p(0) * px + p(1) * py + p(2)
    w1 = p(3) * px + p(4) * py + p(5)
    w2 = p(6) * px + p(7) * py + p(8)
    inv_zc = p(10) * px + p(11) * py + p(12)
    ok = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & (inv_zc > invz)
    tid = jax.lax.bitcast_convert_type(
        jnp.full(px.shape, p(9), jnp.float32), jnp.int32
    ) - _ID_BIAS
    return jnp.where(ok, inv_zc, invz), jnp.where(ok, tid, idx)


def _make_dense_kernel(nbx, n_b, n_global):
    def kernel(yoff_ref, starts_ref, sorted_hbm_ref, zout_ref, iout_ref,
               scratch, sem):
        b = pl.program_id(0)
        by = b // nbx
        bx = b % nbx
        py = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
                jnp.float32
            )
            + (by * TILE_H).astype(jnp.float32)
            + 0.5
            + yoff_ref[0, 0]
        )
        px = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
                jnp.float32
            )
            + (bx * TILE_W).astype(jnp.float32)
            + 0.5
        )

        def stream_range(raw_start, raw_end, carry):
            # Round the range start down to a DMA-aligned boundary; extra
            # candidates tested belong to neighboring ranges and fail the
            # inside-test here (binning is a conservative superset of
            # coverage), so correctness and determinism are unaffected.
            start = (raw_start // _ALIGN) * _ALIGN
            count = jnp.maximum(raw_end - start, 0)
            nchunks = pl.cdiv(count, CHUNK)

            def get_dma(slot, ci):
                row0 = (start + ci * CHUNK) // PACK
                return pltpu.make_async_copy(
                    sorted_hbm_ref.at[pl.ds(row0, CHUNK_ROWS)],
                    scratch.at[slot],
                    sem.at[slot],
                )

            # double-buffered: fetch chunk ci+1 while testing chunk ci
            @pl.when(nchunks > 0)
            def _():
                get_dma(0, 0).start()

            def chunk_body(ci, carry2):
                z, idx = carry2
                slot = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < nchunks)
                def _():
                    get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                get_dma(slot, ci).wait()
                rows_in_chunk = pl.cdiv(
                    jnp.minimum(count - ci * CHUNK, CHUNK), PACK
                )

                def rbody(r, carry3):
                    zr, idxr = carry3
                    for c in range(PACK):  # unrolled: static lane offsets
                        zr, idxr = _candidate_test(
                            lambda k, c=c: scratch[slot, r, c * 16 + k],
                            px, py, zr, idxr,
                        )
                    return zr, idxr

                return jax.lax.fori_loop(0, rows_in_chunk, rbody, (z, idx))

            return jax.lax.fori_loop(0, nchunks, chunk_body, carry)

        z0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)  # inverse-z buffer
        i0 = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
        # global (big-triangle) bucket, capped at n_global
        g_start = starts_ref[n_b]
        g_end = jnp.minimum(starts_ref[n_b + 1], g_start + n_global)
        carry = stream_range(g_start, g_end, (z0, i0))
        # this tile's own candidates
        invz, idx = stream_range(starts_ref[b], starts_ref[b + 1], carry)
        zout_ref[0] = jnp.where(invz > 0.0, 1.0 / invz, jnp.inf)
        iout_ref[0] = idx

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "n_global", "e_cap_factor",
                     "clip_near", "e_cap_rows", "micro_cap_rows",
                     "micro_max", "micro_split"),
)
def rasterize(
    vertices,
    faces,
    rotation,
    translation,
    focal_lengths,
    principal_point,
    y_offset=0,
    face_vertices=None,
    *,
    height,
    width,
    n_global=1024,
    e_cap_factor=3,
    clip_near=False,
    e_cap_rows=None,
    micro_cap_rows=None,
    micro_max=None,
    micro_split=None,
    tri_ids=None,
):
    """Dense-mesh drop-in for rasterize.xla.rasterize (no per-tile cap).

    e_cap_rows: static override of the candidate budget (rounded up to a
    CHUNK multiple). Default is e_cap_factor rows per triangle — safe but
    wasteful on micro-heavy meshes where the packed-table gather pays per
    budget row; probe the exact need with `candidate_count` (the
    renderers do this automatically once per resolution).

    micro_cap_rows: static budget for the micro fragment path (None =
    every triangle gets micro_max^2 fragment slots, the safe default).
    When fewer than T, micro triangles are compacted to that many rows
    first — the fragment sorts then scale with micro_max^2 * the MICRO
    count, not the triangle count (4 * 99k slots -> 4 * 17k at the
    scannet preset's default threshold, where only 8.7k of 99k triangles
    are micro). Probe via `candidate_stats`; rows past the budget land
    in the overflow counter.

    micro_max: micro/streaming routing threshold (pixel-center bbox side;
    default None = the SM_MICRO_MAX env knob — 2 under the default
    'auto', whose per-resolution pick the RENDERERS/plan_fuse pass in
    explicitly via dense_e_cap). Any value yields the
    same image — it only moves triangles between the fragment path and
    the streaming kernel — but budgets probed under one threshold must be
    used with the same threshold.

    micro_split: static row index k — setup rows [0, k) emit ONE fragment
    slot instead of micro_max^2 (their micro class is bbox <= 1x1; larger
    uni rows fall through to the streaming kernel, so the image stays
    exact for ANY k). For a caller that pre-sorts faces so sub-pixel-in-
    every-view triangles come first (rendered ids are then PERMUTED face
    ids — un-permute the fused accumulator once per scene), this cuts the
    fragment z-resolve sort volume by ~44% at the dense-preset shape
    (82% of its 500k triangles are sub-pixel): rows = T + (mm^2-1)*(T-k)
    + HW instead of mm^2*T + HW. Mutually exclusive with micro_cap_rows
    (it targets the micro-dominated regime where compaction is a no-op).
    Rounding k DOWN (e.g. to a size bucket) is always safe.

    tri_ids: optional (T,) int32 — the ids to EMIT for each face row
    (default: the row index). A uni-split caller passes the original face
    ids of its permuted faces, so the rendered image is in ORIGINAL face
    order at zero marginal cost: ids already ride the fragment-sort
    payload and the packed candidate table (and the z-resolve tie-break
    then picks the lowest ORIGINAL id, matching the unpermuted path
    exactly). Unsupported with clip_near (rows are clip pieces)."""
    _check_micro_max(micro_max)
    if tri_ids is not None and clip_near:
        raise ValueError(
            "tri_ids is unsupported with clip_near: setup rows are clip "
            "pieces, not faces (and micro_split already excludes "
            "clip_near)"
        )
    if micro_split is not None and micro_cap_rows is not None:
        raise ValueError(
            "micro_split and micro_cap_rows are mutually exclusive: the "
            "uni-slot prefix targets micro-dominated meshes where "
            "compaction is a no-op"
        )
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    y_offset = jnp.asarray(y_offset, jnp.float32)
    setup = xla_rast._make_setup(
        vertices, faces, rotation, translation, focal_lengths,
        principal_point, face_vertices, clip_near,
    )

    T = setup["denom"].shape[0]  # 2x faces when clip_near
    nby = _cdiv(height, TILE_H)
    nbx = _cdiv(width, TILE_W)
    B = nby * nbx

    def micro_images(micro):
        """Fragment-path images + dropped-micro count (compacted when a
        micro budget below T is given)."""
        if micro_cap_rows is not None and int(micro_cap_rows) < T:
            cap = min(_cdiv(max(int(micro_cap_rows), 8), 8) * 8, T)
            sub, take, valid, dropped = _compact_micro(setup, micro, cap)
            z, i = _rasterize_micro(
                sub, valid, height, width, y_offset,
                tri_ids=take if tri_ids is None else tri_ids[take],
                micro_max=micro_max,
            )
            return z, i, dropped
        z, i = _rasterize_micro(setup, micro, height, width, y_offset,
                                tri_ids=tri_ids, micro_max=micro_max,
                                micro_split=micro_split)
        return z, i, jnp.int32(0)

    if e_cap_rows is not None and int(e_cap_rows) == 0:
        # Pure-micro fast path: the candidate probe saw ZERO (tile,
        # triangle) pairs (every visible triangle is sub-2x2-pixel, the
        # ScanNet-dense regime), so skip binning sort + streaming kernel
        # entirely (~11 ms at 500k tris). Later frames that do produce
        # candidates at this budget spill them to the overflow counter
        # (exact closed-form count), same contract as any budget breach.
        micro, small, big, _, _, span_h, span_w = _classify(
            setup, height, width, y_offset, micro_max, micro_split
        )
        overflow = _pair_count(small, big, span_h, span_w)
        z_micro, idx_micro, micro_dropped = micro_images(micro)
        overflow = overflow + micro_dropped
        if clip_near:  # piece id -> original triangle id
            idx_micro = jnp.where(idx_micro >= 0, idx_micro >> 1, -1)
        return idx_micro, z_micro, overflow
    if e_cap_rows is None:
        e_cap = _cdiv(max(int(e_cap_factor) * T, CHUNK), CHUNK) * CHUNK
    else:
        e_cap = _cdiv(max(int(e_cap_rows), CHUNK), CHUNK) * CHUNK

    tri_sorted, starts, overflow, micro = _build_sorted_bins(
        setup, height, width, y_offset, e_cap, n_global, micro_max,
        micro_split,
    )
    z_micro, idx_micro, micro_dropped = micro_images(micro)
    overflow = overflow + micro_dropped

    # packed parameter table: PACK candidates per 128-lane row (HBM)
    table = _gather_candidate_tables(
        setup, tri_sorted[None, :], tri_ids=tri_ids
    )[0]
    table = table.reshape(-1, PACK * _N_PARAMS)

    kernel = _make_dense_kernel(nbx, B, n_global)
    zimg, iimg = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y_offset (1, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # starts (B + 2,)
            pl.BlockSpec(memory_space=pl.ANY),  # packed params (HBM)
        ],
        out_specs=[
            pl.BlockSpec(
                (1, TILE_H, TILE_W), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TILE_H, TILE_W), lambda b: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, TILE_H, TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((B, TILE_H, TILE_W), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, CHUNK_ROWS, PACK * _N_PARAMS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(y_offset.reshape(1, 1), starts, table)

    zimg = (
        zimg.reshape(nby, nbx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(nby * TILE_H, nbx * TILE_W)[:height, :width]
    )
    iimg = (
        iimg.reshape(nby, nbx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(nby * TILE_H, nbx * TILE_W)[:height, :width]
    )
    # merge the micro-fragment image: lexicographic (z, idx) minimum, with
    # empty (-1) indices comparing as +inf
    big_i32 = jnp.int32(2**31 - 1)
    itile = jnp.where(iimg < 0, big_i32, iimg)
    imicro = jnp.where(idx_micro < 0, big_i32, idx_micro)
    take_micro = (z_micro < zimg) | ((z_micro == zimg) & (imicro < itile))
    zimg = jnp.where(take_micro, z_micro, zimg)
    iimg = jnp.where(take_micro, idx_micro, iimg)
    if clip_near:  # piece id -> original triangle id
        iimg = jnp.where(iimg >= 0, iimg >> 1, -1)
    return iimg, zimg, overflow


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near", "micro_max",
                              "micro_split")
)
def candidate_count(vertices, faces, rotation, translation, focal_lengths,
                    principal_point, y_offset=0, face_vertices=None, *,
                    height, width, clip_near=False, micro_max=None,
                    micro_split=None):
    """Exact dense-path candidate count for one view (device scalar).

    One cheap elementwise pass (no sort). Use it to right-size
    `rasterize(..., e_cap_rows=...)`: at a 2M-triangle 1024x768 bench
    view every triangle is micro, the true count is 0, and the default
    budget gathers 6M sentinel rows (~160 ms) for nothing.
    """
    _check_micro_max(micro_max)
    setup = xla_rast._make_setup(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32),
        rotation, translation, focal_lengths, principal_point,
        face_vertices, clip_near,
    )
    return count_pairs(setup, height, width,
                       jnp.asarray(y_offset, jnp.float32), micro_max,
                       micro_split)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near", "micro_max",
                              "micro_split")
)
def candidate_stats(vertices, faces, rotation, translation, focal_lengths,
                    principal_point, y_offset=0, face_vertices=None, *,
                    height, width, clip_near=False, micro_max=None,
                    micro_split=None):
    """(pair_count, micro_count) for one view as a (2,) int32 device array.

    Same elementwise pass as candidate_count plus the count of triangles
    the fragment path will resolve — the probe for `micro_cap_rows`.
    """
    _check_micro_max(micro_max)
    setup = xla_rast._make_setup(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32),
        rotation, translation, focal_lengths, principal_point,
        face_vertices, clip_near,
    )
    y_offset = jnp.asarray(y_offset, jnp.float32)
    micro, small, big, _, _, span_h, span_w = _classify(
        setup, height, width, y_offset, micro_max, micro_split
    )
    pairs = _pair_count(small, big, span_h, span_w)
    return jnp.stack([pairs, jnp.sum(micro.astype(jnp.int32))])


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near")
)
def uni_eligible(vertices, faces, rotation, translation, focal_lengths,
                 principal_point, face_vertices=None, *,
                 height, width, clip_near=False):
    """(T,) bool: triangle's pixel-center bbox is <= 1x1 in THIS view (or
    the triangle is invalid/off-screen — it emits nothing either way).

    AND this over a scene's camera batch, stable-argsort eligible rows
    first, and pass the eligible count as `rasterize(micro_split=k)` with
    the permuted faces: the uni rows then cost one fragment slot each.
    (With clip_near each input face contributes TWO setup rows; the
    returned mask is per setup row — permute at the PIECE level is not
    supported, so use micro_split only without clip_near.)"""
    setup = xla_rast._make_setup(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32),
        rotation, translation, focal_lengths, principal_point,
        face_vertices, clip_near,
    )
    return _uni_from_setup(setup, height, width)


def _uni_from_setup(setup, height, width):
    _, _, nx, ny = _micro_pixel_range(setup)
    onscreen = (
        (setup["xmax"] >= 0) & (setup["xmin"] < width)
        & (setup["ymax"] >= 0) & (setup["ymin"] < height)
    )
    return ~(setup["valid"] & onscreen) | ((nx <= 1) & (ny <= 1))


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near")
)
def uni_eligible_batch(vertices, faces, rotations, translations,
                       focal_lengths, principal_points, face_vertices=None,
                       *, height, width, clip_near=False):
    """AND of uni_eligible over a camera batch (leading axis) in ONE
    dispatch: a lax.scan over the views carries the running (T,) bool, so
    memory stays O(T) and a scene needs one device->host sync instead of
    one ~25 ms tunnel readback per view (1,700-frame ScanNet scenes paid
    ~40 s of prep in the per-view loop this replaces)."""
    verts = jnp.asarray(vertices, jnp.float32)
    facs = jnp.asarray(faces, jnp.int32)

    def step(uni, cam):
        rot, trans, fl, pp = cam
        setup = xla_rast._make_setup(
            verts, facs, rot, trans, fl, pp, face_vertices, clip_near
        )
        return uni & _uni_from_setup(setup, height, width), None

    uni0 = jnp.ones(facs.shape[0], bool)
    uni, _ = jax.lax.scan(
        step, uni0,
        (rotations, translations, focal_lengths, principal_points),
    )
    return uni


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near", "micro_max",
                              "micro_split")
)
def candidate_count_batch(vertices, faces, rotations, translations,
                          focal_lengths, principal_points, y_offset=0,
                          face_vertices=None, *, height, width,
                          clip_near=False, micro_max=None,
                          micro_split=None):
    """max over a camera batch of candidate_count, in ONE dispatch (scan
    carries the running max; O(T) memory). The budget probe for batched
    pipelines — one sync per scene instead of one per view."""
    _check_micro_max(micro_max)
    verts = jnp.asarray(vertices, jnp.float32)
    facs = jnp.asarray(faces, jnp.int32)
    y_offset = jnp.asarray(y_offset, jnp.float32)

    def step(best, cam):
        rot, trans, fl, pp = cam
        setup = xla_rast._make_setup(
            verts, facs, rot, trans, fl, pp, face_vertices, clip_near
        )
        pairs = count_pairs(setup, height, width, y_offset, micro_max,
                            micro_split)
        return jnp.maximum(best, pairs), None

    best, _ = jax.lax.scan(
        step, jnp.int32(0),
        (rotations, translations, focal_lengths, principal_points),
    )
    return best


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near", "micro_max",
                              "micro_split")
)
def candidate_stats_batch(vertices, faces, rotations, translations,
                          focal_lengths, principal_points, y_offset=0,
                          face_vertices=None, *, height, width,
                          clip_near=False, micro_max=None,
                          micro_split=None):
    """Elementwise max over a camera batch of candidate_stats, in ONE
    dispatch: a (2,) int32 of (max pairs, max micro count) — everything
    the budget AND the split-vs-compaction decision need, one sync per
    scene."""
    _check_micro_max(micro_max)
    verts = jnp.asarray(vertices, jnp.float32)
    facs = jnp.asarray(faces, jnp.int32)
    y_offset = jnp.asarray(y_offset, jnp.float32)

    def step(best, cam):
        rot, trans, fl, pp = cam
        setup = xla_rast._make_setup(
            verts, facs, rot, trans, fl, pp, face_vertices, clip_near
        )
        micro, small, big, _, _, span_h, span_w = _classify(
            setup, height, width, y_offset, micro_max, micro_split
        )
        stats = jnp.stack([
            _pair_count(small, big, span_h, span_w),
            jnp.sum(micro.astype(jnp.int32)),
        ])
        return jnp.maximum(best, stats), None

    best, _ = jax.lax.scan(
        step, jnp.zeros(2, jnp.int32),
        (rotations, translations, focal_lengths, principal_points),
    )
    return best


def split_frag_rows(k, n_setup_rows, micro_max=None):
    """Fragment-sort rows under the uni-slot prefix (micro_split=k):
    one slot per uni row, micro_max^2 per remaining row — compaction is
    unavailable (mutually exclusive with micro_split in rasterize())."""
    m = MICRO_MAX if micro_max is None else int(micro_max)
    return int(k) + m * m * (int(n_setup_rows) - int(k))


def compact_frag_rows(micro, n_setup_rows, micro_max=None):
    """Fragment-sort rows under micro compaction at the cap policy's
    budget margin (the same estimate pick_micro_max prices)."""
    m = MICRO_MAX if micro_max is None else int(micro_max)
    return m * m * min(BUDGET_MARGIN * int(micro), int(n_setup_rows))


def split_wins(k, n_setup_rows, micro, micro_max=None):
    """True iff the uni-slot prefix yields fewer fragment-sort rows than
    micro compaction at this routing threshold. The two are mutually
    exclusive, so every split consumer must make this choice; fragment
    volume is the only term that differs (pair counts are identical —
    uni rows are sub-pixel, hence micro-class at any threshold).

    Measured basis (v5e, round 4, bench presets): the dense preset
    (k/T = 0.82, all-micro — compaction is a no-op) wins with the split,
    22.66 -> 24.13 MPix/s; the scannet preset (k = 0, micro/T = 0.09 at
    threshold 2) REGRESSED 27.55 -> 22.97 under an unconditional split
    because it forfeited compaction (397k fragment rows vs 70k). This
    gate picks the winner in both regimes."""
    return (split_frag_rows(k, n_setup_rows, micro_max)
            < compact_frag_rows(micro, n_setup_rows, micro_max))


def uni_order(vertices, faces, rot, trans, fl, pp, *, height, width):
    """The micro_split caller recipe in one call: AND uni_eligible over a
    camera batch (leading axis), stable-sort eligible rows first.

    Returns (perm (T,) int64, k): rasterize `faces[perm]` with
    `micro_split=k`; rendered primitive ids are then PERMUTED — map a
    fused (P, C) accumulator back once per scene with `acc[inv]` where
    `inv = np.argsort(perm)` (the per-scene inverse gather is the whole
    un-permute cost; renderers that must return original ids per pixel
    should not use the split)."""
    import numpy as np

    uni = np.asarray(uni_eligible_batch(
        vertices, faces, rot, trans, fl, pp, height=height, width=width,
    ))
    return np.argsort(~uni, kind="stable"), int(uni.sum())


def routing_curve(setup, height, width, y_offset,
                  thresholds=ROUTING_THRESHOLDS):
    """(len(thresholds), 2) int32 of (pairs, micro_tris) per candidate
    routing threshold — one elementwise pass per threshold, no sort. The
    probe behind SM_MICRO_MAX=auto (shares _classify with the budgets, so
    a chosen threshold's row IS that threshold's budget probe)."""
    rows = []
    for m in thresholds:
        micro, small, big, _, _, span_h, span_w = _classify(
            setup, height, width, y_offset, m
        )
        rows.append(jnp.stack([
            _pair_count(small, big, span_h, span_w),
            jnp.sum(micro.astype(jnp.int32)),
        ]))
    return jnp.stack(rows)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near", "thresholds")
)
def routing_stats(vertices, faces, rotation, translation, focal_lengths,
                  principal_point, y_offset=0, face_vertices=None, *,
                  height, width, clip_near=False,
                  thresholds=ROUTING_THRESHOLDS):
    """Jitted single-view routing_curve (same argument contract as
    candidate_stats)."""
    setup = xla_rast._make_setup(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32),
        rotation, translation, focal_lengths, principal_point,
        face_vertices, clip_near,
    )
    return routing_curve(setup, height, width,
                         jnp.asarray(y_offset, jnp.float32), thresholds)


# the cap policy's budget margin (render._DenseCapPolicy.MARGIN) — kept
# here as a plain constant to avoid a circular import; the two must match
# for pick_micro_max's fragment-row estimate to be exact
BUDGET_MARGIN = 2


def pick_micro_max(curve, n_setup_rows, thresholds=ROUTING_THRESHOLDS,
                   min_pairs_budget=0):
    """Choose the routing threshold minimizing the linear cost model
    alpha*pairs + beta*fragment_rows (+ gamma*K_SPAN*rows while any
    pairs remain — the binning sort is skipped entirely at pairs == 0).

    curve: (len(thresholds), 2) of (pairs, micro) ints (host values).
    n_setup_rows: triangle rows in the setup (2x faces under clip_near).
    min_pairs_budget: a grow-only budget floor from an earlier overflow
    (render._DenseCapPolicy.invalidate): a nonzero floor keeps
    e_cap_rows > 0, so the binning sort runs even at pairs == 0 and the
    gamma saving must not be credited.
    Fragment rows are threshold^2 * min(2*micro, rows): the budgets carry
    the cap policy's 2x margin, and compaction only engages below the
    row count — above it every setup row keeps its slots regardless of
    the micro count. Ties break toward the smaller threshold."""
    best_m, best_cost = None, None
    rows = int(n_setup_rows)
    for m, row in zip(thresholds, curve):
        pairs, micro = int(row[0]), int(row[1])
        frag_rows = m * m * min(BUDGET_MARGIN * micro, rows)
        cost = ROUTE_ALPHA * pairs + ROUTE_BETA * frag_rows
        if pairs > 0 or min_pairs_budget > 0:
            cost += ROUTE_GAMMA * K_SPAN * rows
        if best_cost is None or cost < best_cost:
            best_m, best_cost = int(m), cost
    return best_m


def pick_route(curve, n_setup_rows, thresholds=ROUTING_THRESHOLDS,
               min_pairs_budget=0):
    """pick_micro_max + the picked threshold's raw (pairs, micro) counts
    as an (pairs, micro, micro_max) int tuple — the single definition of
    'probe the curve, pick, and budget at the pick' shared by the
    renderers' cap-policy probe and bench.py (scale the first two by
    BUDGET_MARGIN for budgets)."""
    curve = [(int(r[0]), int(r[1])) for r in curve]
    m = pick_micro_max(curve, n_setup_rows, thresholds, min_pairs_budget)
    i = list(thresholds).index(m)
    return (curve[i][0], curve[i][1], m)
