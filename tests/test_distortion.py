"""Lens-distortion support (SIMPLE_RADIAL / RADIAL / OPENCV cameras).

The reference's Camera union covers only the two pinhole models and makes
users undistort COLMAP workspaces externally
(ref: include/semantic_meshes/render/Camera.h:9-12); COLMAP's default model
is SIMPLE_RADIAL, so the TPU build supports the radial/OpenCV family
natively: forward/inverse distortion in geometry.py (oracle-tested here
against an independent numpy transcription of COLMAP's camera_models.h
equations) and a virtual-pinhole + resample render path in render.py.
"""

import os
import struct

import numpy as np
import pytest

from semantic_meshes import geometry
from semantic_meshes import render as render_mod
from semantic_meshes.data import Camera, Colmap, Ply, stack_cameras
from semantic_meshes.io import colmap as colmap_io


# --------------------------------------------------------------------------
# independent numpy oracle of COLMAP's distortion equations
# (transcribed from COLMAP src/base/camera_models.h Distortion() — the
# radial polynomial + OpenCV tangential terms)
# --------------------------------------------------------------------------


def oracle_distort(model, raw_params, xy):
    x, y = xy[..., 0], xy[..., 1]
    if model == "SIMPLE_RADIAL":
        k1, k2, p1, p2 = raw_params[3], 0.0, 0.0, 0.0
    elif model == "RADIAL":
        k1, k2, p1, p2 = raw_params[3], raw_params[4], 0.0, 0.0
    elif model == "OPENCV":
        k1, k2, p1, p2 = raw_params[4], raw_params[5], raw_params[6], raw_params[7]
    else:
        raise AssertionError(model)
    r2 = x * x + y * y
    radial = k1 * r2 + k2 * r2 * r2
    dx = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([x + dx, y + dy], axis=-1)


def oracle_undistort(dist4, xy_d, iters=200):
    """Independent fixed-point inversion (different algorithm from the
    jax Newton implementation): x <- x_d - delta(x)."""
    k1, k2, p1, p2 = dist4
    xy = xy_d.copy()
    for _ in range(iters):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = k1 * r2 + k2 * r2 * r2
        dx = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xy = xy_d - np.stack([dx, dy], axis=-1)
    return xy


PARAM_SETS = [
    ("SIMPLE_RADIAL", np.array([40.0, 32.0, 24.0, 0.08])),
    ("SIMPLE_RADIAL", np.array([40.0, 32.0, 24.0, -0.12])),
    ("RADIAL", np.array([40.0, 32.0, 24.0, 0.06, -0.02])),
    ("OPENCV", np.array([40.0, 42.0, 32.0, 24.0, -0.08, 0.015, 0.004, -0.003])),
]


def canonical(model, raw):
    if model == "SIMPLE_RADIAL":
        return np.array([raw[3], 0, 0, 0], np.float32)
    if model == "RADIAL":
        return np.array([raw[3], raw[4], 0, 0], np.float32)
    return np.asarray(raw[4:8], np.float32)


class TestDistortionMath:
    def test_forward_matches_colmap_oracle(self):
        rng = np.random.default_rng(0)
        xy = rng.uniform(-0.6, 0.6, size=(257, 2)).astype(np.float32)
        for model, raw in PARAM_SETS:
            got = np.asarray(
                geometry.distort_normalized(xy, canonical(model, raw))
            )
            want = oracle_distort(model, raw, xy.astype(np.float64))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_undistort_inverts_forward(self):
        rng = np.random.default_rng(1)
        xy = rng.uniform(-0.5, 0.5, size=(301, 2)).astype(np.float32)
        for model, raw in PARAM_SETS:
            d4 = canonical(model, raw)
            xy_d = np.asarray(geometry.distort_normalized(xy, d4))
            back = np.asarray(geometry.undistort_normalized(xy_d, d4))
            np.testing.assert_allclose(back, xy, atol=2e-5)

    def test_undistort_matches_independent_fixed_point(self):
        rng = np.random.default_rng(2)
        xy_d = rng.uniform(-0.4, 0.4, size=(101, 2)).astype(np.float64)
        for model, raw in PARAM_SETS:
            d4 = canonical(model, raw).astype(np.float64)
            got = np.asarray(
                geometry.undistort_normalized(
                    xy_d.astype(np.float32), d4.astype(np.float32)
                )
            )
            want = oracle_undistort(d4, xy_d)
            np.testing.assert_allclose(got, want, atol=3e-5)

    def test_max_monotonic_radius(self):
        """Closed-form fold radius of the radial polynomial (the bound
        _undistort_grid clamps diverged Newton pixels to, ADVICE r4)."""
        inf = float("inf")
        # monotonic lenses: no fold
        assert float(geometry.max_monotonic_radius(
            np.zeros(4, np.float32))) == inf
        assert float(geometry.max_monotonic_radius(
            np.array([0.2, 0, 0, 0], np.float32))) == inf  # pincushion
        # barrel k1 < 0, k2 = 0: fold at r = sqrt(-1/(3 k1))
        got = float(geometry.max_monotonic_radius(
            np.array([-0.12, 0, 0, 0], np.float32)))
        np.testing.assert_allclose(got, np.sqrt(1.0 / (3 * 0.12)),
                                   rtol=1e-6)
        # general k1/k2: the derivative really is zero at the returned
        # radius and positive inside it
        for k1, k2 in [(-0.08, 0.015), (0.06, -0.02), (-0.3, -0.05)]:
            r = float(geometry.max_monotonic_radius(
                np.array([k1, k2, 0, 0], np.float32)))
            if np.isfinite(r):
                d = 1 + 3 * k1 * r**2 + 5 * k2 * r**4
                np.testing.assert_allclose(d, 0.0, atol=1e-4)
                rin = np.linspace(0, r * 0.98, 64)
                assert (1 + 3 * k1 * rin**2 + 5 * k2 * rin**4 > 0).all()

    def test_undistort_grid_fold_clamp_preserves_focal_scale(self):
        """A strong barrel lens whose corners sit past the fold radius:
        the fold clamp must keep the virtual-pinhole scale within the
        invertible range instead of letting one diverged corner shrink it
        toward the 3x-corner fallback (undersampling the whole frame)."""
        import jax.numpy as jnp

        fl = jnp.asarray([30.0, 30.0])
        pp = jnp.asarray([48.0, 36.0])
        dist = jnp.asarray([-0.5, 0.0, 0.0, 0.0])  # fold at r ~ 0.816
        n, s = render_mod._undistort_grid(fl, pp, dist, height=72, width=96)
        r_fold = float(geometry.max_monotonic_radius(dist))
        r_n = np.sqrt(np.asarray(n[..., 0]) ** 2 + np.asarray(n[..., 1]) ** 2)
        assert r_n.max() <= r_fold * (1 + 1e-5)
        # with every ray inside the fold radius the pinhole frame already
        # contains fl * r_fold = 24.5 px of reach — no shrink at all (the
        # pre-fix 3x-corner fallback allowed diverged radii up to ~6.0,
        # which would have scaled the focal down ~3x for the whole frame)
        assert float(s) == 1.0

    def test_zero_distortion_is_identity(self):
        xy = np.linspace(-1, 1, 20).reshape(10, 2).astype(np.float32)
        z = np.zeros(4, np.float32)
        np.testing.assert_array_equal(
            np.asarray(geometry.distort_normalized(xy, z)), xy
        )
        np.testing.assert_allclose(
            np.asarray(geometry.undistort_normalized(xy, z)), xy, atol=0
        )


class TestColmapIO:
    def _write_bin(self, path, model_id, raw_params):
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 7, model_id))
            f.write(struct.pack("<QQ", 64, 48))
            f.write(np.asarray(raw_params, "<f8").tobytes())

    @pytest.mark.parametrize(
        "model,mid",
        [("SIMPLE_RADIAL", 2), ("RADIAL", 3), ("OPENCV", 4)],
    )
    def test_bin_parse_distorted_models(self, tmp_path, model, mid):
        raw = dict(PARAM_SETS)[model] if model != "SIMPLE_RADIAL" else PARAM_SETS[0][1]
        p = tmp_path / "cameras.bin"
        self._write_bin(p, mid, raw)
        cams = colmap_io.read_cameras_bin(str(p))
        cam = cams[7]
        assert cam.model == model
        np.testing.assert_allclose(cam.distortion, canonical(model, raw))
        if model == "OPENCV":
            np.testing.assert_allclose(cam.focal_lengths, raw[:2])
            np.testing.assert_allclose(cam.principal_point, raw[2:4])
        else:
            np.testing.assert_allclose(cam.focal_lengths, [raw[0], raw[0]])
            np.testing.assert_allclose(cam.principal_point, raw[1:3])

    def test_txt_roundtrip_all_models(self, tmp_path):
        cams = {}
        for i, (model, raw) in enumerate(PARAM_SETS):
            if model == "OPENCV":
                fl, pp = raw[:2], raw[2:4]
            else:
                fl, pp = np.array([raw[0], raw[0]]), raw[1:3]
            cams[i + 1] = colmap_io.ColmapCamera(
                i + 1, model, 64, 48, fl, pp, canonical(model, raw)
            )
        p = tmp_path / "cameras.txt"
        colmap_io.write_cameras_txt(str(p), cams)
        back = colmap_io.read_cameras_txt(str(p))
        for cid, cam in cams.items():
            np.testing.assert_allclose(back[cid].distortion, cam.distortion)
            np.testing.assert_allclose(
                back[cid].focal_lengths, cam.focal_lengths
            )

    def test_thin_prism_parses_on_extended_wire(self, tmp_path):
        # every COLMAP model parses now; THIN_PRISM_FISHEYE (the last to
        # land) rides the extended wire with selector LENS_THIN_PRISM
        # (full coverage in tests/test_lens_models.py)
        from semantic_meshes.geometry import LENS_THIN_PRISM

        p = tmp_path / "cameras.bin"
        self._write_bin(p, 10, np.zeros(12))
        cam = next(iter(colmap_io.read_cameras_bin(str(p)).values()))
        assert cam.model == "THIN_PRISM_FISHEYE"
        assert cam.distortion.shape == (9,)
        assert cam.distortion[8] == LENS_THIN_PRISM


class TestCameraPytree:
    def test_ctor_pads_and_defaults(self):
        cam = Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24])
        assert cam.distortion.shape == (4,)
        assert not np.any(cam.distortion)
        cam2 = Camera(
            np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
            distortion=[0.1],
        )
        np.testing.assert_allclose(cam2.distortion, [0.1, 0, 0, 0])
        with pytest.raises(ValueError, match="distortion"):
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
                   distortion=np.zeros(10))

    def test_pytree_roundtrip_keeps_distortion(self):
        import jax

        cam = Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
                     distortion=[0.1, -0.02, 0.003, 0.001])
        leaves, tree = jax.tree_util.tree_flatten(cam)
        assert len(leaves) == 5
        back = jax.tree_util.tree_unflatten(tree, leaves)
        np.testing.assert_allclose(back.distortion, cam.distortion)


# --------------------------------------------------------------------------
# rendering
# --------------------------------------------------------------------------


class _Mesh:
    """Minimal Ply-like mesh (vertices/faces attributes)."""

    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, np.float32)
        self.faces = np.asarray(faces, np.int32)


def scene():
    """Two overlapping triangles at different depths filling the view."""
    vertices = np.array(
        [
            [-2.0, -2.0, 4.0], [2.5, -2.0, 4.0], [0.0, 2.5, 4.0],
            [-1.0, -1.5, 3.0], [1.5, -0.5, 3.0], [-0.5, 1.5, 3.0],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return _Mesh(vertices, faces)


def make_camera(distortion=None, width=64, height=48, f=40.0):
    return Camera(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        (width, height), [f, f], [width / 2, height / 2],
        distortion=distortion,
    )


class TestDistortedRender:
    def test_zero_distortion_path_is_bit_identical(self):
        """The virtual-pinhole + resample path with k = 0 must reproduce
        the pinhole render EXACTLY (s = 1 and the sampling map is the
        identity on pixel centers) — pins the resample layout/indexing."""
        mesh = scene()
        r = render_mod.triangles(mesh)
        cam = make_camera()
        idx_p, dep_p = r.render(cam)
        idx_d, dep_d, _ = render_mod._render_triangles_distorted_jit(
            r.vertices, r.faces, r.face_vertices,
            cam.rotation, cam.translation, cam.focal_lengths,
            cam.principal_point, cam.distortion,
            height=cam.height, width=cam.width,
            max_tris_per_tile=r.max_tris_per_tile, backend=r.backend,
        )
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_d))
        np.testing.assert_array_equal(np.asarray(dep_p), np.asarray(dep_d))

    def test_resample_preserves_index_bits(self):
        """_resample_wh must be bit-exact on adversarial uint32 patterns:
        0xFFFFFFFF (background = NaN payload as float bits) and small
        primitive ids (denormal floats). TPU f32 gathers in the fused
        2-lane packed form canonicalize NaNs and flush denormals to zero
        — measured on v5e (round 5); the packing therefore rides uint32
        lanes, which any backend moves inertly. Regression for the bug
        that zeroed EVERY resampled primitive index on the real chip
        while the CPU suite stayed green."""
        import jax
        import jax.numpy as jnp

        w_img, h_img = 64, 48
        rng = np.random.default_rng(3)
        idx = rng.integers(0, 1000, (w_img, h_img)).astype(np.uint32)
        idx[rng.random((w_img, h_img)) < 0.3] = 0xFFFFFFFF
        idx[0, 0] = 0x00800000  # smallest normal-float bits
        idx[1, 0] = 1           # denormal bits
        depth = rng.random((w_img, h_img)).astype(np.float32)
        depth[idx.astype(np.int64) == 0xFFFFFFFF] = np.inf
        # identity grid: every distorted pixel samples its own center
        yy, xx = np.mgrid[0:h_img, 0:w_img].astype(np.float32)
        fl = jnp.asarray([60.0, 60.0])
        pp = jnp.asarray([0.0, 0.0])
        n = jnp.asarray(
            np.stack([(xx + 0.5) / 60.0, (yy + 0.5) / 60.0], axis=-1)
        )
        got_idx, got_dep = jax.jit(render_mod._resample_wh)(
            jnp.asarray(idx), jnp.asarray(depth), n, fl, pp
        )
        np.testing.assert_array_equal(np.asarray(got_idx), idx)
        np.testing.assert_array_equal(
            np.asarray(got_dep).view(np.uint32), depth.view(np.uint32)
        )

    @pytest.mark.parametrize("k1", [0.15, -0.1])
    def test_matches_normalized_space_oracle(self, k1):
        """Distorted render == brute-force z-buffer at each distorted
        pixel's true (oracle-undistorted) ray, up to nearest-resample
        quantization at triangle edges."""
        mesh = scene()
        r = render_mod.triangles(mesh)
        cam = make_camera(distortion=[k1], width=96, height=72, f=60.0)
        idx, dep = r.render(cam)
        idx = np.asarray(idx).T  # (H, W)
        dep = np.asarray(dep).T

        h, w = 72, 96
        ys, xs = np.mgrid[0:h, 0:w]
        nd = np.stack(
            [
                (xs + 0.5 - cam.principal_point[0]) / cam.focal_lengths[0],
                (ys + 0.5 - cam.principal_point[1]) / cam.focal_lengths[1],
            ],
            axis=-1,
        ).astype(np.float64)
        n = oracle_undistort(np.array([k1, 0, 0, 0]), nd)

        # brute-force z-buffer in normalized coords
        verts = mesh.vertices
        best_z = np.full((h, w), np.inf)
        best_i = np.full((h, w), -1)
        for t, f in enumerate(mesh.faces):
            tri = verts[f]
            pn = tri[:, :2] / tri[:, 2:3]  # normalized projection
            bary = np.asarray(
                geometry.barycentric_2d(n, pn[0], pn[1], pn[2])
            )
            inside = np.all(bary >= 0, axis=-1)
            inv_z = bary @ (1.0 / tri[:, 2])
            zz = 1.0 / inv_z
            ok = inside & (inv_z > 0) & (zz < best_z)
            best_z = np.where(ok, zz, best_z)
            best_i = np.where(ok, t, best_i)

        got = np.where(idx == 0xFFFFFFFF, -1, idx.astype(np.int64))
        mismatch = got != best_i
        assert mismatch.mean() < 0.02, (
            f"{mismatch.sum()} of {mismatch.size} pixels disagree with the "
            "normalized-space oracle"
        )
        both = (got >= 0) & (best_i >= 0) & ~mismatch
        np.testing.assert_allclose(
            dep[both], best_z[both], rtol=5e-3
        )

    def test_render_many_matches_single(self):
        mesh = scene()
        r = render_mod.triangles(mesh)
        cams = [
            make_camera(distortion=[0.12]),
            make_camera(distortion=[-0.08, 0.01]),
            make_camera(),  # pinhole mixed into the batch
        ]
        idxs, deps = r.render_many(cams)
        for i, cam in enumerate(cams):
            idx1, dep1 = r.render(cam)
            np.testing.assert_array_equal(
                np.asarray(idxs[i]), np.asarray(idx1)
            )
            np.testing.assert_allclose(
                np.asarray(deps[i]), np.asarray(dep1), rtol=1e-6
            )

    def test_texels_zero_distortion_bit_identical(self):
        mesh = scene()
        cam0 = make_camera()
        r = render_mod.texels(mesh, [cam0], texels_per_pixel=0.05)
        idx_p, dep_p = r.render(cam0)
        idx_d, dep_d, _ = render_mod._render_texels_distorted_jit(
            r.vertices, r.faces, r.face_vertices, r.resolutions,
            r.first_texel_index, cam0.rotation, cam0.translation,
            cam0.focal_lengths, cam0.principal_point, cam0.distortion,
            height=cam0.height, width=cam0.width,
            max_tris_per_tile=r.max_tris_per_tile, backend=r.backend,
            num_primitives=r.getPrimitivesNum(),
        )
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_d))
        np.testing.assert_array_equal(np.asarray(dep_p), np.asarray(dep_d))

    def test_texels_distorted_indices_valid_and_batch_consistent(self):
        mesh = scene()
        cams = [
            make_camera(distortion=[0.1]),
            make_camera(distortion=[-0.06]),
        ]
        r = render_mod.texels(mesh, cams, texels_per_pixel=0.05)
        idxs, deps = r.render_many(cams)
        for i, cam in enumerate(cams):
            idx1, dep1 = r.render(cam)
            np.testing.assert_array_equal(
                np.asarray(idxs[i]), np.asarray(idx1)
            )
            arr = np.asarray(idx1)
            fg = arr != 0xFFFFFFFF
            assert fg.any()
            assert arr[fg].max() < r.getPrimitivesNum()


class TestDistortedFusedPipelines:
    """Distortion through the ONE-PROGRAM pipelines (round-5, VERDICT r4
    item 4): fuse_views / fuse_views_texels / make_sharded_fuse accept
    per-view lens parameters and must equal the per-view
    render() -> MeshAggregator.add() path — COLMAP's default model is
    SIMPLE_RADIAL, so real workspaces ride these paths."""

    def _scene_and_cams(self):
        mesh = scene()
        cams = [
            make_camera(distortion=[0.12]),
            make_camera(distortion=[-0.08, 0.01]),
            make_camera(),  # pinhole (zero lens) mixed into the batch
            make_camera(distortion=[0.05]),
        ]
        return mesh, cams

    def _per_view_state(self, renderer, cams, probs, agg_name, P, C):
        from semantic_meshes.fusion import MeshAggregator

        agg = MeshAggregator(
            primitives=P, classes=C, aggregator=agg_name,
            images_equal_weight=0.5,
        )
        for cam, pr in zip(cams, probs):
            idx, _ = renderer.render(cam)
            agg.add(idx, pr.transpose(1, 0, 2))
        return np.asarray(agg.state)

    @pytest.mark.parametrize("agg_name", ["sum", "mul"])
    def test_fuse_views_distorted_equals_per_view(self, agg_name):
        from semantic_meshes import distributed, testing
        from semantic_meshes.data import stack_distortions

        mesh, cams = self._scene_and_cams()
        r = render_mod.triangles(mesh)
        P, C = r.getPrimitivesNum(), 4
        W, H = cams[0].resolution
        rng = np.random.default_rng(5)
        probs = np.stack(
            [testing.random_probs(rng, H, W, C, dont_care_frac=0.1)
             for _ in cams]
        )
        want = self._per_view_state(r, cams, probs, agg_name, P, C)
        rot, trans, fl, pp = stack_cameras(cams)
        acc, overflow = distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=stack_distortions(cams),
            num_primitives=P, aggregator=agg_name, height=H, width=W,
        )
        assert int(overflow) == 0
        np.testing.assert_allclose(
            np.asarray(acc), want, rtol=2e-5, atol=1e-5
        )

    def test_fuse_views_texels_distorted_equals_per_view(self):
        from semantic_meshes import distributed, testing
        from semantic_meshes.data import stack_distortions

        mesh, cams = self._scene_and_cams()
        r = render_mod.texels(mesh, cams, texels_per_pixel=0.05)
        P, C = r.getPrimitivesNum(), 3
        W, H = cams[0].resolution
        rng = np.random.default_rng(6)
        probs = np.stack(
            [testing.random_probs(rng, H, W, C) for _ in cams]
        )
        want = self._per_view_state(r, cams, probs, "sum", P, C)
        rot, trans, fl, pp = stack_cameras(cams)
        acc, overflow = distributed.fuse_views_texels(
            r.vertices, r.faces, r.resolutions, r.first_texel_index,
            rot, trans, fl, pp, probs, np.float32(0.5),
            distortions=stack_distortions(cams),
            num_primitives=P, aggregator="sum", height=H, width=W,
        )
        assert int(overflow) == 0
        np.testing.assert_allclose(
            np.asarray(acc), want, rtol=2e-5, atol=1e-5
        )

    def test_sharded_distorted_matches_single_chip(self):
        import jax
        from jax.sharding import Mesh

        from semantic_meshes import distributed, testing
        from semantic_meshes.data import stack_distortions

        devices = np.array(jax.devices())
        if devices.size < 4:
            pytest.skip("needs 4 devices (virtual cpu mesh)")
        dev_mesh = Mesh(devices[:4].reshape(4, 1), ("views", "pixels"))

        mesh, cams = self._scene_and_cams()
        P, C = len(mesh.faces), 3
        W, H = cams[0].resolution
        rng = np.random.default_rng(7)
        probs = np.stack(
            [testing.random_probs(rng, H, W, C) for _ in cams]
        )
        rot, trans, fl, pp = stack_cameras(cams)
        dists = stack_distortions(cams)
        kw = dict(num_primitives=P, aggregator="sum", height=H, width=W)
        ref = np.asarray(distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=dists, **kw,
        )[0])
        fuse = distributed.make_sharded_fuse(
            dev_mesh, with_distortion=True, **kw
        )
        with dev_mesh:
            got = np.asarray(
                fuse(mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
                     np.float32(0.5), dists)[0]
            )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    def test_sharded_distortion_rejects_pixel_axis(self):
        import jax
        from jax.sharding import Mesh

        from semantic_meshes import distributed

        devices = np.array(jax.devices())
        if devices.size < 2:
            pytest.skip("needs 2 devices")
        dev_mesh = Mesh(devices[:2].reshape(1, 2), ("views", "pixels"))
        with pytest.raises(ValueError, match="pixels"):
            distributed.make_sharded_fuse(
                dev_mesh, with_distortion=True, num_primitives=2,
                aggregator="sum", height=48, width=64,
            )


class TestColmapWorkspaceEndToEnd:
    def test_simple_radial_workspace_renders_and_fuses(self, tmp_path):
        """A synthetic SIMPLE_RADIAL COLMAP workspace loads (the reference
        raises and demands external undistortion) and drives the full
        render -> fuse pipeline."""
        from semantic_meshes.fusion import MeshAggregator
        from semantic_meshes.io import ply as ply_io

        mesh = scene()
        ply_path = tmp_path / "mesh.ply"
        ply_io.write_mesh(
            str(ply_path), mesh.vertices, mesh.faces,
            np.zeros((2, 3), np.uint8),
        )

        with open(tmp_path / "cameras.txt", "w") as f:
            f.write("# cameras\n")
            f.write("1 SIMPLE_RADIAL 96 72 60.0 48.0 36.0 0.12\n")
        with open(tmp_path / "images.txt", "w") as f:
            f.write("1 1 0 0 0 0 0 0 1 view0.png\n\n")

        workspace = Colmap(str(tmp_path))
        cam = workspace.getCamera(0)
        np.testing.assert_allclose(cam.distortion, [0.12, 0, 0, 0])
        assert cam.resolution == (96, 72)

        mesh_ply = Ply(str(ply_path))
        r = render_mod.triangles(mesh_ply)
        idx, dep = r.render(cam)
        arr = np.asarray(idx)
        fg = arr != 0xFFFFFFFF
        assert fg.mean() > 0.2  # the scene fills a good part of the view

        # fuse a probs image that labels the near triangle class 1,
        # far triangle class 0 based on the rendered indices themselves
        agg = MeshAggregator(r.getPrimitivesNum(), classes=2)
        probs = np.zeros((96, 72, 2), np.float32)
        probs[..., 0] = np.where(arr == 0, 1.0, 0.0)
        probs[..., 1] = np.where(arr == 1, 1.0, 0.0)
        agg.add(idx, probs)
        fused = np.asarray(agg.get())
        assert fused[0].argmax() == 0
        assert fused[1].argmax() == 1
