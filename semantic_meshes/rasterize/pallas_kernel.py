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
# 0..2: a0,b0,c0 | 3..5: a1,b1,c1 | 6..8: a2,b2,c2  (edge forms,
#   PRE-MULTIPLIED by sign(denom): inside test is w_i >= 0 directly — no
#   per-candidate sign scalar read or multiply in the kernel)
# 9: triangle id (int32, +_ID_BIAS, bitcast to f32) | 10..12: az,bz,cz
# 13..15: unused
# (ids ride inside the f32 table because a separate (1, 1, N) int32 block
# violates the TPU (8, 128) block-tiling rule)
_N_PARAMS = 16

# id-lane encoding: bitcast(small int32) is a DENORMAL f32, and TPU
# flush-to-zero erases it somewhere between the table build and the kernel
# read (measured: depths bit-identical, every kernel-path id read back 0).
# Adding 2^23 before the bitcast puts every id bit-pattern in the normal
# range (exponent >= 1), which all f32 data movement preserves; the kernels
# subtract it back after the reverse bitcast.
_ID_BIAS = 1 << 23  # python int: a jnp scalar would be captured by pallas


def _gather_candidate_tables(setup, cand, tri_ids=None):
    """(B, N) candidate ids -> params (B, N, 16) f32 + ids (B, N) i32.

    Invalid triangles (sign 0) and the sentinel id T get c_i = -1, so the
    pre-signed inside test w_i = a_i*px + b_i*py + c_i >= 0 always fails.

    tri_ids: optional (T,) int32 ids the kernel should EMIT for each setup
    row (default: the row index). A uni-split plan passes the original
    face ids here, so the rendered image lands in original face order for
    free — the id rides the packed-table gather that happens anyway
    (plan_fuse; the measured per-pixel remap alternative cost ~5.7 ms per
    786k-pixel view and ate the split's win).
    """
    T = setup["denom"].shape[0]

    sgn = jnp.sign(jnp.where(setup["valid"], setup["denom"], 0.0))
    bad = sgn == 0.0
    zero = jnp.zeros_like(sgn)
    cols = []
    for e in range(3):
        cols.append(jnp.where(bad, zero, setup["a"][:, e] * sgn))
        cols.append(jnp.where(bad, zero, setup["b"][:, e] * sgn))
        cols.append(jnp.where(bad, -1.0, setup["c"][:, e] * sgn))
    if tri_ids is None:
        tri_ids = jnp.arange(T, dtype=jnp.int32)
    cols.append(
        jax.lax.bitcast_convert_type(tri_ids + _ID_BIAS, jnp.float32)
    )
    cols += [setup["az"], setup["bz"], setup["cz"]]
    table = jnp.stack(cols, axis=-1)  # (T, 13)
    table = jnp.pad(table, ((0, 0), (0, _N_PARAMS - table.shape[-1])))
    # sentinel row: all zeros except c_i = -1 (never inside)
    sent = jnp.zeros((1, _N_PARAMS), table.dtype)
    sent = sent.at[0, jnp.array([2, 5, 8])].set(-1.0)
    table = jnp.concatenate([table, sent], 0)  # (T+1, 16)
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
        invz, idx = carry

        def p(k):
            # dynamic candidate index through the VMEM ref (dynamic_slice on
            # loaded values does not lower on TPU)
            return params_ref[0, 0, n, k]

        # pre-signed edge forms: inside is w_i >= 0 directly; the z-test
        # runs in INVERSE-z space (buffer init 0 = empty; inv_z > buf is
        # exactly z < z_buf for inv_z > 0, and behind-camera inv_z <= 0
        # can never beat buf >= 0) — no per-candidate reciprocal, no sign
        # multiply, one fewer scalar read
        w0 = p(0) * px + p(1) * py + p(2)
        w1 = p(3) * px + p(4) * py + p(5)
        w2 = p(6) * px + p(7) * py + p(8)
        inv_zc = p(10) * px + p(11) * py + p(12)
        ok = (
            (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & (inv_zc > invz)
        )
        # scalar bitcast does not lower on TPU; broadcast then bitcast vector
        tid = jax.lax.bitcast_convert_type(
            jnp.full((TILE_H, TILE_W), p(9), jnp.float32), jnp.int32
        ) - _ID_BIAS
        invz = jnp.where(ok, inv_zc, invz)
        idx = jnp.where(ok, tid, idx)
        return invz, idx

    z0 = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    i0 = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    invz, idx = jax.lax.fori_loop(0, n_cand, body, (z0, i0))
    zout_ref[...] = jnp.where(invz > 0.0, 1.0 / invz, jnp.inf)
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
