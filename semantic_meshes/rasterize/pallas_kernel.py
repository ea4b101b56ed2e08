"""Pallas TPU rasterizer — the v1 compute path.

Same contract as rasterize.xla.rasterize (tile-binned deterministic z-min
resolve, ref semantics per include/semantic_meshes/render/TriangleRenderer.h),
but the per-tile z/index buffers live in VMEM for the whole candidate loop:

- XLA v0: the fori_loop carry (all tiles' z+index buffers) round-trips HBM
  on every candidate iteration -> O(N_candidates) full-image HBM passes.
- Pallas v1: grid = screen tiles; each grid step loads its (N, 16) candidate
  parameter block once, loops candidates against the tile entirely on-chip
  (VPU FMAs on a (TILE_H, TILE_W) block), and writes the resolved tile once.
  HBM traffic drops to one read of the candidate tables + one write of the
  image.

Triangle setup and binning are shared with the XLA path (they are
matmul-free gather/top_k passes XLA handles well); only the z-resolve loop
is a custom kernel. TPU grid steps execute sequentially per core, so the
deterministic lowest-index tie-break is preserved exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import xla as xla_rast

TILE_H = xla_rast.TILE_H
TILE_W = xla_rast.TILE_W

# params lane layout (padded to 16 lanes for clean VMEM tiling)
# 0..2: a0,b0,c0 | 3..5: a1,b1,c1 | 6..8: a2,b2,c2 | 9: sign(denom)
# 10..12: az,bz,cz | 13: triangle id (int32 bitcast to f32) | 14..15: unused
# (ids ride inside the f32 table because a separate (1, 1, N) int32 block
# violates the TPU (8, 128) block-tiling rule)
_N_PARAMS = 16


def _gather_candidate_tables(setup, cand):
    """(B, N) candidate ids -> params (B, N, 16) f32 + ids (B, N) i32.

    The sentinel id T maps to a zero row (sign 0 -> never covers)."""
    T = setup["denom"].shape[0]

    def pad(x):
        return jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], 0)

    sgn = jnp.sign(jnp.where(setup["valid"], setup["denom"], 0.0))
    cols = [
        setup["a"][:, 0], setup["b"][:, 0], setup["c"][:, 0],
        setup["a"][:, 1], setup["b"][:, 1], setup["c"][:, 1],
        setup["a"][:, 2], setup["b"][:, 2], setup["c"][:, 2],
        sgn,
        setup["az"], setup["bz"], setup["cz"],
    ]
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    cols.append(jax.lax.bitcast_convert_type(tri_ids, jnp.float32))
    table = jnp.stack(cols, axis=-1)  # (T, 14)
    table = jnp.pad(table, ((0, 0), (0, _N_PARAMS - table.shape[-1])))
    table = pad(table)  # (T+1, 16)
    return table[cand]  # (B, N, 16)


def _raster_kernel(yoff_ref, counts_ref, params_ref, zout_ref, iout_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # dynamic per-tile candidate count: the key advantage over the XLA path,
    # which must always run the full static candidate budget per tile
    n_cand = counts_ref[i, j]

    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
            jnp.float32
        )
        + (i * TILE_H).astype(jnp.float32)
        + 0.5
        + yoff_ref[0, 0]
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
            jnp.float32
        )
        + (j * TILE_W).astype(jnp.float32)
        + 0.5
    )

    def body(n, carry):
        z, idx = carry

        def p(k):
            # dynamic candidate index through the VMEM ref (dynamic_slice on
            # loaded values does not lower on TPU)
            return params_ref[0, 0, n, k]

        sgn = p(9)
        w0 = p(0) * px + p(1) * py + p(2)
        w1 = p(3) * px + p(4) * py + p(5)
        w2 = p(6) * px + p(7) * py + p(8)
        inside = (
            (w0 * sgn >= 0.0)
            & (w1 * sgn >= 0.0)
            & (w2 * sgn >= 0.0)
            & (sgn != 0.0)
        )
        inv_z = p(10) * px + p(11) * py + p(12)
        zc = 1.0 / inv_z
        ok = inside & (inv_z > 0.0) & (zc < z)
        # scalar bitcast does not lower on TPU; broadcast then bitcast vector
        tid = jax.lax.bitcast_convert_type(
            jnp.full((TILE_H, TILE_W), p(13), jnp.float32), jnp.int32
        )
        z = jnp.where(ok, zc, z)
        idx = jnp.where(ok, tid, idx)
        return z, idx

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    i0 = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    z, idx = jax.lax.fori_loop(0, n_cand, body, (z0, i0))
    zout_ref[...] = z
    iout_ref[...] = idx


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "clip_near"),
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
    max_tris_per_tile=256,
    clip_near=False,
):
    """Drop-in replacement for rasterize.xla.rasterize on TPU."""
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    y_offset = jnp.asarray(y_offset, jnp.float32)
    setup = xla_rast._make_setup(
        vertices, faces, rotation, translation, focal_lengths,
        principal_point, face_vertices, clip_near,
    )
    cand, counts, overflow = xla_rast._bin_triangles(
        setup, height, width, max_tris_per_tile, y_offset
    )
    params = _gather_candidate_tables(setup, cand)

    nby = -(-height // TILE_H)
    nbx = -(-width // TILE_W)
    N = cand.shape[1]
    params = params.reshape(nby, nbx, N, _N_PARAMS)
    counts = counts.reshape(nby, nbx)

    zimg, iimg = pl.pallas_call(
        _raster_kernel,
        grid=(nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y_offset scalar
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-tile counts
            pl.BlockSpec(
                (1, 1, N, _N_PARAMS),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_H, TILE_W), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nby * TILE_H, nbx * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct((nby * TILE_H, nbx * TILE_W), jnp.int32),
        ],
        interpret=_use_interpret(),
    )(y_offset.reshape(1, 1), counts, params)

    iimg = iimg[:height, :width]
    if clip_near:  # piece id -> original triangle id
        iimg = jnp.where(iimg >= 0, iimg >> 1, -1)
    return iimg, zimg[:height, :width], overflow
