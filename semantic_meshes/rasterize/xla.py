"""Tile-binned triangle rasterizer in pure XLA (jnp) — the v0 compute path.

TPU-native replacement for tt::geometry::render::DeviceMutexRasterizer
(ref: include/semantic_meshes/render/TriangleRenderer.h:81-92,
TexturedTriangleRenderer.h:210-222). The CUDA design races threads over
triangles and resolves the z-test with per-pixel mutexes; on TPU the same
problem is expressed as a deterministic reduction:

  1. project all vertices (one batched matmul-ish pass),
  2. bin triangles to screen tiles (static-shape top-k candidate lists),
  3. per tile, scan candidates and keep the z-min fragment per pixel.

Determinism: ties on z resolve to the lower triangle index (the mutex
rasterizer is nondeterministic there — this is an intentional improvement,
see SURVEY.md §5 "race detection").

Output contract matches the reference renderer: per-pixel
{primitive_index uint32 (0xFFFFFFFF empty), z float32 (+inf empty)}
(ref: TriangleRenderer.h:75-78, python/semantic_meshes/include/Renderer.h:25-43).
Images here are (H, W) row-major; the public render API transposes to the
reference's (W, H) layout at the boundary.

Near-plane handling: triangles with any vertex at z <= Z_NEAR are culled
rather than clipped (static shapes; matches typical use where cameras sit
outside the mesh). No backface culling — the reference renders both windings
(its texel debug harness exercises all 6 vertex orders,
ref: python/scripts/debug_render_texels.py:25).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry

Z_NEAR = 1e-6
INVALID_U32 = np.uint32(0xFFFFFFFF)

# Tile shape: 32 sublanes x 128 lanes — VPU-aligned (f32 min tile is (8, 128)).
TILE_H = 32
TILE_W = 128


def _cdiv(a, b):
    return -(-a // b)


def project_vertices(vertices, rotation, translation, focal_lengths,
                     principal_point):
    """World-space vertices -> (pixel xy (V, 2), camera z (V,))."""
    cam = geometry.rigid_transform(rotation, translation, vertices)
    pix = geometry.pinhole_project(focal_lengths, principal_point, cam)
    return pix, cam[..., 2]


def _triangle_setup(pix, z_cam, faces):
    """Per-triangle affine coefficients (gather path: pix/z per vertex)."""
    return _setup_from_projected(pix[faces], z_cam[faces])


def _face_vertices_cam(face_vertices, rotation, translation):
    """(T, 3, 3) world face-vertex positions -> camera space.

    Explicit elementwise rigid transform: a (3, 3) matmul over 3T points
    belongs on the VPU, and spelling it out keeps the TPU compiler away
    from pathological dot strategies."""
    fv = face_vertices
    x, y, z = fv[..., 0], fv[..., 1], fv[..., 2]
    cx = rotation[0, 0] * x + rotation[0, 1] * y + rotation[0, 2] * z + \
        translation[0]
    cy = rotation[1, 0] * x + rotation[1, 1] * y + rotation[1, 2] * z + \
        translation[1]
    cz = rotation[2, 0] * x + rotation[2, 1] * y + rotation[2, 2] * z + \
        translation[2]
    return jnp.stack([cx, cy, cz], axis=-1)


def _project_cam(cam, focal_lengths, principal_point):
    px = focal_lengths[0] * (cam[..., 0] / cam[..., 2]) + principal_point[0]
    py = focal_lengths[1] * (cam[..., 1] / cam[..., 2]) + principal_point[1]
    return jnp.stack([px, py], axis=-1)


def setup_from_face_vertices(face_vertices, rotation, translation,
                             focal_lengths, principal_point):
    """Gather-free setup from pre-expanded (T, 3, 3) face-vertex positions.

    Vertex->face gathers dominate per-view cost on large meshes (~60 ns per
    face on TPU); expanding the faces once at renderer init turns the
    per-view work into pure streaming transforms (3x the FLOPs, no gathers —
    a big net win, the FLOPs are trivial).
    """
    cam = _face_vertices_cam(face_vertices, rotation, translation)
    pix = _project_cam(cam, focal_lengths, principal_point)
    return _setup_from_projected(pix, cam[..., 2])


CLIP_Z_NEAR = 1e-4


def setup_clipped(face_vertices, rotation, translation, focal_lengths,
                  principal_point):
    """Setup with true near-plane CLIPPING: each triangle yields up to two
    pieces with interleaved ids (piece ids 2i and 2i+1 for triangle i, so
    ascending piece order preserves the lowest-original-index tie-break).
    Callers map winner ids back with id >> 1.

    The v1 contract culls near-plane-crossing triangles (static shapes,
    cameras outside the mesh); this opt-in path renders their in-front
    parts — important when the camera is inside the scene (indoor ScanNet).
    """
    from .. import geometry

    cam = _face_vertices_cam(face_vertices, rotation, translation)
    pieces, valid = geometry.clip_triangles_near(cam, CLIP_Z_NEAR)
    t = cam.shape[0]
    cam2 = pieces.reshape(2 * t, 3, 3)
    pix2 = _project_cam(cam2, focal_lengths, principal_point)
    setup = _setup_from_projected(pix2, cam2[..., 2])
    setup["valid"] = setup["valid"] & valid.reshape(2 * t)
    return setup


def _setup_from_projected(p, z):
    """Core setup from projected vertices p (T, 3, 2) and camera z (T, 3).

    Returns dict of (T,) arrays: edge coeffs (a_i, b_i, c_i for i in 0..2 with
    w_i(x, y) = a_i x + b_i y + c_i), denom (signed 2*area), inv-z plane
    coeffs, bbox, and validity.
    """
    px, py = p[..., 0], p[..., 1]

    def edge(i, j):
        # w = signed_area2(p_i, p_j, pixel) = a x + b y + c
        ax, ay = px[:, i], py[:, i]
        bx, by = px[:, j], py[:, j]
        a = -(by - ay)
        b = bx - ax
        c = (by - ay) * ax - (bx - ax) * ay
        return a, b, c

    a0, b0, c0 = edge(1, 2)
    a1, b1, c1 = edge(2, 0)
    a2, b2, c2 = edge(0, 1)
    denom = a0 * px[:, 0] + b0 * py[:, 0] + c0  # w0 at p0 == 2*signed area
    denom = denom + 0.0

    safe_denom = jnp.where(denom == 0, 1.0, denom)
    inv_z_v = 1.0 / jnp.maximum(z, Z_NEAR)
    az = (a0 * inv_z_v[:, 0] + a1 * inv_z_v[:, 1] + a2 * inv_z_v[:, 2]) / safe_denom
    bz = (b0 * inv_z_v[:, 0] + b1 * inv_z_v[:, 1] + b2 * inv_z_v[:, 2]) / safe_denom
    cz = (c0 * inv_z_v[:, 0] + c1 * inv_z_v[:, 1] + c2 * inv_z_v[:, 2]) / safe_denom

    valid = jnp.all(z > Z_NEAR, axis=-1) & (denom != 0)
    xmin = jnp.min(px, axis=-1)
    xmax = jnp.max(px, axis=-1)
    ymin = jnp.min(py, axis=-1)
    ymax = jnp.max(py, axis=-1)
    return dict(
        a=jnp.stack([a0, a1, a2], -1),
        b=jnp.stack([b0, b1, b2], -1),
        c=jnp.stack([c0, c1, c2], -1),
        denom=denom,
        az=az,
        bz=bz,
        cz=cz,
        valid=valid,
        xmin=xmin,
        xmax=xmax,
        ymin=ymin,
        ymax=ymax,
    )


def _make_setup(vertices, faces, rotation, translation, focal_lengths,
                principal_point, face_vertices, clip_near=False):
    """Setup dispatch: gather-free when pre-expanded face vertices exist;
    clip_near routes through the near-plane clipper (2 pieces/triangle)."""
    rot = jnp.asarray(rotation, jnp.float32)
    trans = jnp.asarray(translation, jnp.float32)
    fl = jnp.asarray(focal_lengths, jnp.float32)
    pp = jnp.asarray(principal_point, jnp.float32)
    if clip_near:
        if face_vertices is None:
            face_vertices = jnp.asarray(vertices, jnp.float32)[
                jnp.asarray(faces, jnp.int32)
            ]
        return setup_clipped(
            jnp.asarray(face_vertices, jnp.float32), rot, trans, fl, pp
        )
    if face_vertices is not None:
        return setup_from_face_vertices(
            jnp.asarray(face_vertices, jnp.float32), rot, trans, fl, pp
        )
    pix, z_cam = project_vertices(vertices, rot, trans, fl, pp)
    return _triangle_setup(pix, z_cam, faces)


def _bin_triangles(setup, height, width, max_tris_per_tile, y_offset):
    """Build per-tile candidate triangle lists (static shapes).

    Returns (cand (B, N) int32 triangle ids padded with T, overflow int32
    total dropped (tile, tri) pairs). B = tiles_y * tiles_x. `y_offset`
    shifts the screen window vertically (dynamic scalar; used when image
    rows are sharded across chips — see distributed.make_sharded_fuse).
    """
    T = setup["denom"].shape[0]
    nby = _cdiv(height, TILE_H)
    nbx = _cdiv(width, TILE_W)

    ymin = setup["ymin"] - y_offset
    ymax = setup["ymax"] - y_offset
    # Triangle -> tile-range (inclusive), clipped to screen.
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

    tile_y = jnp.arange(nby, dtype=jnp.int32)
    tile_x = jnp.arange(nbx, dtype=jnp.int32)
    # overlap: (nby, nbx, T) -> (B, T)
    oy = (by0[None, :] <= tile_y[:, None]) & (tile_y[:, None] <= by1[None, :])
    ox = (bx0[None, :] <= tile_x[:, None]) & (tile_x[:, None] <= bx1[None, :])
    overlap = (oy[:, None, :] & ox[None, :, :] & valid[None, None, :]).reshape(
        nby * nbx, T
    )

    tri_ids = jnp.arange(T, dtype=jnp.int32)
    keys = jnp.where(overlap, tri_ids[None, :], T)
    n = min(max_tris_per_tile, T)
    # N smallest keys per tile == ascending triangle ids (deterministic order)
    neg_top, _ = jax.lax.top_k(-keys, n)
    cand = -neg_top  # (B, N) ascending
    counts = jnp.sum(overlap, axis=1)
    overflow = jnp.sum(jnp.maximum(counts - n, 0))
    return cand, jnp.minimum(counts, n).astype(jnp.int32), overflow


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
    """Rasterize a triangle mesh into (tri_index (H, W) int32, depth (H, W)
    f32, overflow int32).

    tri_index is -1 for empty pixels; depth is +inf there. Pixel centers are
    sampled at (x + 0.5, y + 0.5). Coverage is inclusive (bary >= 0); ties on
    depth go to the lower triangle index. `y_offset` renders the row band
    [y_offset, y_offset + height) of a taller image (row-sharded multi-chip
    rasterization).
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    y_offset = jnp.asarray(y_offset, jnp.float32)
    setup = _make_setup(
        vertices, faces, rotation, translation, focal_lengths,
        principal_point, face_vertices, clip_near,
    )
    cand, _counts, overflow = _bin_triangles(
        setup, height, width, max_tris_per_tile, y_offset
    )

    T = setup["denom"].shape[0]  # 2x faces when clip_near
    nby = _cdiv(height, TILE_H)
    nbx = _cdiv(width, TILE_W)
    B = nby * nbx
    N = cand.shape[1]

    # Pixel-center coordinates per tile: (B, TILE_H, TILE_W)
    tile_ids = jnp.arange(B, dtype=jnp.int32)
    base_y = (tile_ids // nbx) * TILE_H
    base_x = (tile_ids % nbx) * TILE_W
    yy = jax.lax.broadcasted_iota(jnp.float32, (1, TILE_H, TILE_W), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (1, TILE_H, TILE_W), 2)
    py = yy + base_y[:, None, None].astype(jnp.float32) + 0.5 + y_offset
    px = xx + base_x[:, None, None].astype(jnp.float32) + 0.5

    # Pad per-triangle tables with one sentinel row (id T -> never covers).
    def pad(x):
        return jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)], 0)

    a = pad(setup["a"])
    b = pad(setup["b"])
    c = pad(setup["c"])
    denom = pad(jnp.where(setup["valid"], setup["denom"], 0.0))
    az = pad(setup["az"])
    bz = pad(setup["bz"])
    cz = pad(setup["cz"])

    def body(n, carry):
        zbuf, ibuf = carry
        tri = cand[:, n]  # (B,)
        ta = a[tri]  # (B, 3)
        tb = b[tri]
        tc = c[tri]
        td = denom[tri]  # (B,)
        sgn = jnp.sign(td)[:, None, None]
        inside = td[:, None, None] != 0.0
        for i in range(3):
            w = (
                ta[:, i, None, None] * px
                + tb[:, i, None, None] * py
                + tc[:, i, None, None]
            )
            inside = inside & (w * sgn >= 0.0)
        inv_z = (
            az[tri][:, None, None] * px
            + bz[tri][:, None, None] * py
            + cz[tri][:, None, None]
        )
        z = 1.0 / inv_z
        ok = inside & (inv_z > 0.0) & (z < zbuf)
        zbuf = jnp.where(ok, z, zbuf)
        ibuf = jnp.where(ok, tri[:, None, None], ibuf)
        return zbuf, ibuf

    zbuf0 = jnp.full((B, TILE_H, TILE_W), jnp.inf, jnp.float32)
    ibuf0 = jnp.full((B, TILE_H, TILE_W), -1, jnp.int32)
    zbuf, ibuf = jax.lax.fori_loop(0, N, body, (zbuf0, ibuf0))

    # (B, TILE_H, TILE_W) -> (H, W)
    zimg = (
        zbuf.reshape(nby, nbx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(nby * TILE_H, nbx * TILE_W)[:height, :width]
    )
    iimg = (
        ibuf.reshape(nby, nbx, TILE_H, TILE_W)
        .transpose(0, 2, 1, 3)
        .reshape(nby * TILE_H, nbx * TILE_W)[:height, :width]
    )
    if clip_near:  # piece id -> original triangle id
        iimg = jnp.where(iimg >= 0, iimg >> 1, -1)
    return iimg, zimg, overflow


@jax.jit
def barycentrics_at_pixels(vertices, faces, rotation, translation,
                           focal_lengths, principal_point, tri_index,
                           y_offset=0):
    """Perspective-correct barycentrics of each pixel's winning triangle.

    Second pass of the texel pipeline: the z-resolve carries only
    (index, depth); the winner's barycentric coordinates are recomputed here
    per pixel (cheap: one triangle per pixel). tri_index: (H, W) int32 with
    -1 for empty. Returns bary3d (H, W, 3) (garbage where tri_index < 0).
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    pix, z_cam = project_vertices(
        vertices,
        jnp.asarray(rotation, jnp.float32),
        jnp.asarray(translation, jnp.float32),
        jnp.asarray(focal_lengths, jnp.float32),
        jnp.asarray(principal_point, jnp.float32),
    )
    height, width = tri_index.shape
    tri = jnp.maximum(tri_index, 0)
    f = faces[tri]  # (H, W, 3)
    p = pix[f]  # (H, W, 3, 2)
    z = z_cam[f]  # (H, W, 3)
    yy = (
        jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
        + jnp.asarray(y_offset, jnp.float32)
    )
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    pt = jnp.stack([xx, yy], axis=-1)
    b2 = geometry.barycentric_2d(
        pt, p[..., 0, :], p[..., 1, :], p[..., 2, :]
    )
    b3, _ = geometry.perspective_correct(b2, jnp.maximum(z, Z_NEAR))
    return b3
