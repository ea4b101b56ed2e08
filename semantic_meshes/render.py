"""Public render API: `triangles(mesh)` and `texels(mesh, cameras, tpp)`.

Parity with the reference python module `semantic_meshes.render`
(ref: python/semantic_meshes/src/Render.cu:12-25):

- `triangles(mesh)` -> renderer over whole-triangle primitives
  (ref: include/semantic_meshes/render/TriangleRenderer.h:11-95)
- `texels(mesh, colmap_or_camera_list[, texels_per_pixel=0.1])` -> renderer
  over sub-triangle texels
  (ref: include/semantic_meshes/render/TexturedTriangleRenderer.h:54-226)

`renderer.render(camera)` returns `(primitive_indices, depth)` as device
jax.Arrays shaped (width, height) — the reference's DLPack contract, where
consumers transpose to (H, W)
(ref: python/semantic_meshes/include/Renderer.h:25-43,
eval-scannet/eval_scannet.py:211-212). Empty pixels are 0xFFFFFFFF / +inf.

TPU-native design: rasterization is a tile-binned deterministic z-reduction
(rasterize/xla.py) instead of a mutex rasterizer; the texels-mode startup
precompute — O(triangles x cameras) host projections in the reference
(TexturedTriangleRenderer.h:93-147) — is a single vmapped device pass.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .data import Camera, Colmap, Ply, stack_cameras
from . import rasterize as rast

logger = logging.getLogger("semantic_meshes")

INVALID_U32 = np.uint32(0xFFFFFFFF)


def _camera_hw(camera: Camera):
    # camera.resolution is (width, height); rasterizer works in (H, W)
    return camera.resolution[1], camera.resolution[0]


class TrianglesRenderer:
    """Whole-triangle primitive renderer (primitive index == triangle index)."""

    def __init__(self, mesh: Ply, max_tris_per_tile: int = 256,
                 backend: str | None = None):
        self.mesh = mesh
        self.vertices = jnp.asarray(mesh.vertices, jnp.float32)
        self.faces = jnp.asarray(mesh.faces, jnp.int32)
        # pre-expanded face-vertex positions: per-view setup becomes
        # gather-free (rasterize.xla.setup_from_face_vertices)
        self.face_vertices = self.vertices[self.faces]
        self.max_tris_per_tile = int(max_tris_per_tile)
        self.backend = backend  # None = auto (xla/pallas/dense by size)

    def getPrimitivesNum(self) -> int:
        return int(self.faces.shape[0])

    def render(self, camera: Camera):
        height, width = _camera_hw(camera)
        tri, depth, overflow = rast.rasterize(
            self.vertices,
            self.faces,
            camera.rotation,
            camera.translation,
            camera.focal_lengths,
            camera.principal_point,
            face_vertices=self.face_vertices,
            backend=self.backend,
            height=height,
            width=width,
            max_tris_per_tile=self.max_tris_per_tile,
        )
        ov = int(overflow)
        if ov:
            logger.warning(
                "rasterizer tile overflow: %d (tile, triangle) pairs dropped; "
                "raise max_tris_per_tile (current %d)",
                ov,
                self.max_tris_per_tile,
            )
        indices = tri.astype(jnp.uint32)  # -1 -> 0xFFFFFFFF
        return indices.T, depth.T  # (W, H) contract

    def render_many(self, cameras):
        """Render a batch of same-resolution cameras in one compiled scan.

        Returns (indices (N, W, H) uint32, depth (N, W, H) f32). TPU-native
        extension: amortizes dispatch and keeps the whole batch on device.
        """
        cams = list(cameras)
        height, width = _camera_hw(cams[0])
        if any(_camera_hw(c) != (height, width) for c in cams):
            raise ValueError("render_many needs equal camera resolutions")
        rot, trans, fl, pp = stack_cameras(cams)
        tri, depth = _render_scan(
            self.vertices, self.faces, self.face_vertices, rot, trans, fl,
            pp, height=height, width=width,
            max_tris_per_tile=self.max_tris_per_tile,
        )
        return (
            tri.astype(jnp.uint32).transpose(0, 2, 1),
            depth.transpose(0, 2, 1),
        )


def _texel_resolutions(vertices, faces, cameras, texels_per_pixel):
    """Per-triangle texel grid resolution r = ceil(tpp * sqrt(max screen area)).

    Vectorized equivalent of the reference's host OpenMP loop over
    (triangles x cameras) (ref: TexturedTriangleRenderer.h:93-127): a camera
    contributes a triangle's screen-space area iff any vertex is in front of
    it and all three projected vertices fall within the 0.5-resolution border
    around the image.
    """
    rot, trans, fl, pp = stack_cameras(cameras)
    resolutions = np.asarray([c.resolution for c in cameras], np.float32)  # (C,2)

    @jax.jit
    def compute(vertices, faces, rot, trans, fl, pp, resolutions):
        def per_camera(rot, trans, fl, pp, res):
            cam = geometry.rigid_transform(rot, trans, vertices)  # (V, 3)
            pix = geometry.pinhole_project(fl, pp, cam)  # (V, 2)
            p = pix[faces]  # (T, 3, 2)
            z = cam[..., 2][faces]  # (T, 3)
            in_front = jnp.any(z > 0, axis=-1)
            border = 0.5
            lo = -border * res
            hi = (1.0 + border) * res
            inside = jnp.all((p >= lo) & (p < hi), axis=(-2, -1))
            area = geometry.triangle_screen_area(p)
            return jnp.where(in_front & inside, area, 0.0)  # (T,)

        areas = jax.vmap(per_camera)(rot, trans, fl, pp, resolutions)  # (C, T)
        max_area = jnp.max(areas, axis=0)
        return jnp.ceil(
            texels_per_pixel * jnp.sqrt(max_area)
        ).astype(jnp.int32)

    return compute(vertices, faces, rot, trans, fl, pp, resolutions)


class TexelsRenderer:
    """Sub-triangle texel renderer: each triangle is subdivided into an
    r x r triangular grid of texels (r(r+1)/2 primitives), decoupling fusion
    resolution from triangle size (the paper's texel mode)."""

    def __init__(self, mesh: Ply, cameras, texels_per_pixel: float = 0.1,
                 max_tris_per_tile: int = 256, backend: str | None = None):
        self.backend = backend
        if isinstance(cameras, Colmap):
            cameras = cameras.getCameras()
        cameras = list(cameras)
        if not cameras:
            raise ValueError("texels renderer needs at least one camera")
        self.mesh = mesh
        self.vertices = jnp.asarray(mesh.vertices, jnp.float32)
        self.max_tris_per_tile = int(max_tris_per_tile)

        res = _texel_resolutions(
            self.vertices, jnp.asarray(mesh.faces, jnp.int32), cameras,
            float(texels_per_pixel),
        )
        # Reorder face vertices so the most-right-angled vertex maps to
        # uv (0, 0) (ref: TexturedTriangleRenderer.h:129-146). Internal only:
        # unlike the reference we do not mutate the shared Ply's face array.
        self.faces = geometry.reorder_faces_for_texels(
            self.vertices, jnp.asarray(mesh.faces, jnp.int32)
        )
        self.face_vertices = self.vertices[self.faces]
        self.resolutions = res  # (T,) int32
        counts = np.asarray(geometry.texel_count(res), np.int64)  # (T,)
        first = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=first[1:])
        self.first_texel_index = jnp.asarray(first[:-1], jnp.int32)
        self._primitive_num = int(first[-1])
        num_without = int(np.sum(counts == 0))
        logger.info(
            "Got %d triangles, %d texels and %d triangles without texels",
            len(counts),
            self._primitive_num,
            num_without,
        )

    def getPrimitivesNum(self) -> int:
        return self._primitive_num

    def render(self, camera: Camera):
        height, width = _camera_hw(camera)
        tri, depth, overflow = rast.rasterize(
            self.vertices,
            self.faces,
            camera.rotation,
            camera.translation,
            camera.focal_lengths,
            camera.principal_point,
            face_vertices=self.face_vertices,
            backend=self.backend,
            height=height,
            width=width,
            max_tris_per_tile=self.max_tris_per_tile,
        )
        ov = int(overflow)
        if ov:
            logger.warning(
                "rasterizer tile overflow: %d (tile, triangle) pairs dropped; "
                "raise max_tris_per_tile (current %d)",
                ov,
                self.max_tris_per_tile,
            )
        indices = _texel_indices(
            self.vertices,
            self.faces,
            camera.rotation,
            camera.translation,
            camera.focal_lengths,
            camera.principal_point,
            tri,
            self.resolutions,
            self.first_texel_index,
            self._primitive_num,
        )
        return indices.T, depth.T  # (W, H) contract


def _texel_prim_image(vertices, faces, rotation, translation, focal_lengths,
                      principal_point, tri_index, resolutions,
                      first_texel_index, num_primitives, y_offset=0):
    """Texel primitive ids as int32 (invalid pixels -> num_primitives).

    Equivalent of TexturedTriangle::getTexelIndex in the CUDA shader
    (ref: TexturedTriangleRenderer.h:31-41), run as a post-pass over the
    winning fragments. Pixels on triangles with resolution 0 (never seen by
    any setup camera) are invalid rather than colliding with a neighbor's
    first texel. Shared by the public render API and the batched fusion
    pipeline (distributed.fuse_views_texels)."""
    bary = rast.barycentrics_at_pixels(
        vertices, faces, rotation, translation, focal_lengths,
        principal_point, tri_index, y_offset,
    )  # (H, W, 3)
    tri = jnp.maximum(tri_index, 0)
    res = resolutions[tri]  # (H, W)
    rel = geometry.texel_index(bary, jnp.maximum(res, 1))
    prim = first_texel_index[tri] + rel
    valid = (tri_index >= 0) & (res >= 1)
    return jnp.where(valid, prim, num_primitives).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_primitives",))
def _texel_indices(vertices, faces, rotation, translation, focal_lengths,
                   principal_point, tri_index, resolutions, first_texel_index,
                   num_primitives):
    """uint32 texel image with the 0xFFFFFFFF background sentinel
    (public render contract, ref: TriangleRenderer.h:75-78)."""
    prim = _texel_prim_image(
        vertices, faces, rotation, translation, focal_lengths,
        principal_point, tri_index, resolutions, first_texel_index,
        num_primitives,
    )
    return jnp.where(
        prim < num_primitives,
        prim.astype(jnp.uint32),
        jnp.uint32(0xFFFFFFFF),
    )


@functools.partial(
    jax.jit, static_argnames=("height", "width", "max_tris_per_tile")
)
def _render_scan(vertices, faces, face_vertices, rot, trans, fl, pp, *,
                 height, width, max_tris_per_tile):
    def step(_, cam):
        r, t, f, p = cam
        tri, depth, _ov = rast.rasterize(
            vertices, faces, r, t, f, p, face_vertices=face_vertices,
            height=height, width=width, max_tris_per_tile=max_tris_per_tile,
        )
        return None, (tri, depth)

    _, (tris, depths) = jax.lax.scan(step, None, (rot, trans, fl, pp))
    return tris, depths


def triangles(mesh: Ply, **kwargs) -> TrianglesRenderer:
    """Factory matching `semantic_meshes.render.triangles(mesh)`
    (ref: python/semantic_meshes/src/Render.cu:24)."""
    return TrianglesRenderer(mesh, **kwargs)


def texels(mesh: Ply, cameras, texels_per_pixel: float = 0.1,
           **kwargs) -> TexelsRenderer:
    """Factory matching `semantic_meshes.render.texels(mesh, colmap|[cameras]
    [, texels_per_pixel])` (ref: python/semantic_meshes/src/Render.cu:20-23)."""
    return TexelsRenderer(mesh, cameras, texels_per_pixel, **kwargs)


# Reference-compatible class aliases (ref: Render.cu:16-17)
PlyRendererTriangles = TrianglesRenderer
PlyRendererTexels = TexelsRenderer
