"""Extended COLMAP lens-model family (FULL_OPENCV / fisheye / FOV).

The reference supports only the two pinhole models
(ref: include/semantic_meshes/render/Camera.h:9-12); round 4 added the
classic radial/OpenCV family on a (4,) wire. This covers the REST of
COLMAP's camera zoo on the extended 9-wide wire (8 param slots + model
selector, geometry.py LENS_*): FULL_OPENCV's rational polynomial, the
equidistant fisheye family (OPENCV_FISHEYE / SIMPLE_RADIAL_FISHEYE /
RADIAL_FISHEYE), the Devernay-Faugeras FOV model, and THIN_PRISM_FISHEYE
(equidistant projection + radial/tangential/thin-prism terms) — COLMAP's
entire camera zoo. Oracles are independent numpy transcriptions of
COLMAP's camera_models.h equations; inversion is tested as a roundtrip
(the jax path inverts by jvp-Jacobian Newton, a different algorithm).
"""

import struct

import numpy as np
import pytest

from semantic_meshes import geometry
from semantic_meshes import render as render_mod
from semantic_meshes.data import Camera, stack_cameras, stack_distortions
from semantic_meshes.io import colmap as colmap_io


# --------------------------------------------------------------------------
# independent numpy oracles (COLMAP src/base/camera_models.h Distortion())
# --------------------------------------------------------------------------


def oracle_full_opencv(k, xy):
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2, k3, k4, k5, k6 = k
    r2 = x * x + y * y
    rad = (1 + k1 * r2 + k2 * r2**2 + k3 * r2**3) / (
        1 + k4 * r2 + k5 * r2**2 + k6 * r2**3
    )
    ox = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    oy = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([ox, oy], axis=-1)


def oracle_fisheye(ks, xy):
    x, y = xy[..., 0], xy[..., 1]
    r = np.sqrt(x * x + y * y)
    th = np.arctan(r)
    poly = 1.0
    for i, ki in enumerate(ks):
        poly = poly + ki * th ** (2 * (i + 1))
    thd = th * poly
    scale = np.where(r > 1e-12, thd / np.maximum(r, 1e-12), 1.0)
    return xy * scale[..., None]


def oracle_fov(omega, xy):
    x, y = xy[..., 0], xy[..., 1]
    r = np.sqrt(x * x + y * y)
    factor = np.arctan(2 * r * np.tan(omega / 2)) / np.maximum(
        r * omega, 1e-12
    )
    factor = np.where(r > 1e-12, factor, 2 * np.tan(omega / 2) / omega)
    return xy * factor[..., None]


def wire_full_opencv(k8):
    return np.concatenate([np.asarray(k8, np.float32), [0.0]]).astype(
        np.float32
    )


def wire_fisheye(ks):
    d = np.zeros(9, np.float32)
    d[: len(ks)] = ks
    d[8] = geometry.LENS_FISHEYE
    return d


def wire_fov(omega):
    d = np.zeros(9, np.float32)
    d[0] = omega
    d[8] = geometry.LENS_FOV
    return d


def oracle_thin_prism_fisheye(k8, xy):
    """COLMAP ThinPrismFisheyeCameraModel: equidistant projection, then
    Distortion() with params (k1, k2, p1, p2, k3, k4, sx1, sy1)."""
    k1, k2, p1, p2, k3, k4, sx1, sy1 = k8
    x, y = xy[..., 0], xy[..., 1]
    r = np.sqrt(x * x + y * y)
    th = np.arctan(r)
    eq = np.where(r > 1e-12, th / np.maximum(r, 1e-12), 1.0)
    u, v = x * eq, y * eq
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    radial = k1 * r2 + k2 * r2**2 + k3 * r2**3 + k4 * r2**4
    du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2) + sx1 * r2
    dv = v * radial + p1 * (r2 + 2 * v2) + 2 * p2 * uv + sy1 * r2
    return np.stack([u + du, v + dv], axis=-1)


def wire_thin_prism(k8):
    return np.concatenate(
        [np.asarray(k8, np.float32), [geometry.LENS_THIN_PRISM]]
    ).astype(np.float32)


FULL_K = np.array(
    [-0.08, 0.015, 0.004, -0.003, 0.002, 0.01, -0.004, 0.001]
)
FISH_K4 = np.array([0.03, -0.011, 0.002, -0.0005])
TPF_K8 = np.array(
    [0.03, -0.011, 0.002, -0.0015, 0.0008, -0.0002, 0.001, -0.0007]
)


class TestExtendedDistortionMath:
    def _points(self, seed=0, n=257, lim=0.6):
        rng = np.random.default_rng(seed)
        return rng.uniform(-lim, lim, size=(n, 2)).astype(np.float32)

    def test_classic_pad_is_same_model(self):
        """A classic (k1, k2, p1, p2) vector zero-padded onto the extended
        wire must reproduce the classic path (selector 0, k3..k6 = 0 IS
        the OPENCV model) — the invariant stack_distortions relies on when
        it pads a mixed camera batch."""
        xy = self._points()
        d4 = np.array([-0.08, 0.015, 0.004, -0.003], np.float32)
        d9 = np.pad(d4, (0, 5))
        a = np.asarray(geometry.distort_normalized(xy, d4))
        b = np.asarray(geometry.distort_normalized(xy, d9))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_full_opencv_matches_oracle(self):
        xy = self._points(1)
        got = np.asarray(
            geometry.distort_normalized(xy, wire_full_opencv(FULL_K))
        )
        want = oracle_full_opencv(FULL_K, xy.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize(
        "ks",
        [FISH_K4, FISH_K4[:2], FISH_K4[:1], np.zeros(4)],
        ids=["opencv_fisheye", "radial_fisheye", "simple_radial_fisheye",
             "zero_k"],
    )
    def test_fisheye_matches_oracle(self, ks):
        xy = self._points(2)
        got = np.asarray(geometry.distort_normalized(xy, wire_fisheye(ks)))
        want = oracle_fisheye(ks, xy.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_fisheye_zero_k_is_not_identity(self):
        """Equidistant projection bends rays even with zero polynomial
        coefficients (theta = atan r != r) — the zero-lens fast paths
        must NOT treat a zero-k fisheye as pinhole. The selector column
        keeps the wire nonzero, which is what _has_distortion and the
        structural identity-grid check key on."""
        xy = self._points(3)
        d = wire_fisheye(np.zeros(4))
        assert np.any(d)  # nonzero wire despite zero ks
        got = np.asarray(geometry.distort_normalized(xy, d))
        r = np.sqrt((xy**2).sum(-1))
        assert np.abs(got - xy).max() > 1e-3
        want = xy * (np.arctan(r) / np.maximum(r, 1e-12))[:, None]
        np.testing.assert_allclose(got, want, atol=1e-6)

    @pytest.mark.parametrize(
        "k8",
        [TPF_K8, np.zeros(8)],
        ids=["thin_prism", "zero_params"],
    )
    def test_thin_prism_fisheye_matches_oracle(self, k8):
        xy = self._points(7)
        got = np.asarray(
            geometry.distort_normalized(xy, wire_thin_prism(k8))
        )
        want = oracle_thin_prism_fisheye(k8, xy.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_thin_prism_zero_params_equals_equidistant(self):
        """With all eight params zero, THIN_PRISM_FISHEYE reduces to the
        bare equidistant projection — i.e. exactly the zero-k fisheye.
        Like LENS_FISHEYE, this is NOT the identity; the selector keeps
        the wire nonzero for the structural zero-lens checks."""
        xy = self._points(8)
        d = wire_thin_prism(np.zeros(8))
        assert np.any(d)
        got = np.asarray(geometry.distort_normalized(xy, d))
        fish = np.asarray(
            geometry.distort_normalized(xy, wire_fisheye(np.zeros(4)))
        )
        np.testing.assert_allclose(got, fish, atol=1e-6)

    @pytest.mark.parametrize("omega", [0.3, 0.9, 1.4])
    def test_fov_matches_oracle(self, omega):
        xy = self._points(4)
        got = np.asarray(geometry.distort_normalized(xy, wire_fov(omega)))
        want = oracle_fov(omega, xy.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_fov_tiny_omega_is_identity_limit(self):
        xy = self._points(5)
        got = np.asarray(geometry.distort_normalized(xy, wire_fov(0.0)))
        np.testing.assert_allclose(got, xy, atol=1e-7)

    @pytest.mark.parametrize(
        "dist",
        [wire_full_opencv(FULL_K), wire_fisheye(FISH_K4), wire_fov(0.9),
         wire_fisheye(np.zeros(4)), wire_thin_prism(TPF_K8)],
        ids=["full_opencv", "fisheye", "fov", "fisheye_zero_k",
             "thin_prism"],
    )
    def test_undistort_inverts_forward(self, dist):
        xy = self._points(6, n=301, lim=0.5)
        xy_d = np.asarray(geometry.distort_normalized(xy, dist))
        back = np.asarray(geometry.undistort_normalized(xy_d, dist))
        np.testing.assert_allclose(back, xy, atol=3e-5)

    def test_undistort_wide_fisheye_rays(self):
        """Fisheye inversion where undistorted radii far exceed distorted
        ones (the tan blow-up regime Newton has to climb)."""
        r = np.linspace(0.1, 3.5, 40)  # up to ~74 deg incident angle
        xy = np.stack([r / np.sqrt(2), r / np.sqrt(2)], -1).astype(
            np.float32
        )
        d = wire_fisheye(FISH_K4 * 0.5)
        xy_d = np.asarray(geometry.distort_normalized(xy, d))
        back = np.asarray(geometry.undistort_normalized(xy_d, d))
        np.testing.assert_allclose(back, xy, rtol=1e-4, atol=1e-4)

    def test_extended_monotonic_radius_matches_classic(self):
        """The numeric monotone-prefix fold must agree with the classic
        closed form on a padded classic lens (within one sample step)."""
        d4 = np.array([-0.12, 0, 0, 0], np.float32)
        want = float(geometry.max_monotonic_radius(d4))
        got = float(geometry.max_monotonic_radius(np.pad(d4, (0, 5))))
        np.testing.assert_allclose(got, want, rtol=2e-2)

    def test_extended_monotonic_radius_fisheye(self):
        # monotone-everywhere lens: +inf
        assert float(
            geometry.max_monotonic_radius(wire_fisheye(np.zeros(4)))
        ) == float("inf")
        # strongly negative k1 folds theta_d; the returned radius must
        # bracket the true maximum of the forward response
        d = wire_fisheye([-0.3, 0, 0, 0])
        r_fold = float(geometry.max_monotonic_radius(d))
        assert np.isfinite(r_fold) and r_fold > 0
        rr = np.linspace(1e-3, r_fold * 0.98, 256)
        pts = np.stack([rr, np.zeros_like(rr)], -1).astype(np.float32)
        rd = np.asarray(geometry.distort_normalized(pts, d))[:, 0]
        assert (np.diff(rd) > 0).all()  # monotone inside the bound
        beyond = np.asarray(
            geometry.distort_normalized(
                np.array([[r_fold * 1.3, 0.0]], np.float32), d
            )
        )[0, 0]
        assert beyond < rd[-1] * 1.02  # response has stopped growing


class TestColmapExtendedModels:
    def _write_bin(self, path, model_id, raw_params):
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 7, model_id))
            f.write(struct.pack("<QQ", 64, 48))
            f.write(np.asarray(raw_params, "<f8").tobytes())

    @pytest.mark.parametrize(
        "model,mid,raw,want_wire",
        [
            (
                "FULL_OPENCV", 6,
                np.concatenate([[40.0, 42.0, 32.0, 24.0], FULL_K]),
                wire_full_opencv(FULL_K),
            ),
            (
                "OPENCV_FISHEYE", 5,
                np.concatenate([[40.0, 42.0, 32.0, 24.0], FISH_K4]),
                wire_fisheye(FISH_K4),
            ),
            (
                "SIMPLE_RADIAL_FISHEYE", 8,
                np.array([40.0, 32.0, 24.0, 0.03]),
                wire_fisheye([0.03]),
            ),
            (
                "RADIAL_FISHEYE", 9,
                np.array([40.0, 32.0, 24.0, 0.03, -0.011]),
                wire_fisheye([0.03, -0.011]),
            ),
            (
                "FOV", 7,
                np.array([40.0, 42.0, 32.0, 24.0, 0.9]),
                wire_fov(0.9),
            ),
            (
                "THIN_PRISM_FISHEYE", 10,
                np.concatenate([[40.0, 42.0, 32.0, 24.0], TPF_K8]),
                wire_thin_prism(TPF_K8),
            ),
        ],
    )
    def test_bin_parse(self, tmp_path, model, mid, raw, want_wire):
        p = tmp_path / "cameras.bin"
        self._write_bin(p, mid, raw)
        cam = colmap_io.read_cameras_bin(str(p))[7]
        assert cam.model == model
        np.testing.assert_allclose(cam.distortion, want_wire, atol=1e-7)
        if model in ("FULL_OPENCV", "OPENCV_FISHEYE", "FOV",
                     "THIN_PRISM_FISHEYE"):
            np.testing.assert_allclose(cam.focal_lengths, raw[:2])
            np.testing.assert_allclose(cam.principal_point, raw[2:4])
        else:
            np.testing.assert_allclose(cam.focal_lengths, [raw[0], raw[0]])
            np.testing.assert_allclose(cam.principal_point, raw[1:3])

    def test_txt_roundtrip_extended_models(self, tmp_path):
        cams = {
            1: colmap_io.ColmapCamera(
                1, "FULL_OPENCV", 64, 48, np.array([40.0, 42.0]),
                np.array([32.0, 24.0]), wire_full_opencv(FULL_K),
            ),
            2: colmap_io.ColmapCamera(
                2, "OPENCV_FISHEYE", 64, 48, np.array([40.0, 42.0]),
                np.array([32.0, 24.0]), wire_fisheye(FISH_K4),
            ),
            3: colmap_io.ColmapCamera(
                3, "SIMPLE_RADIAL_FISHEYE", 64, 48, np.array([40.0, 40.0]),
                np.array([32.0, 24.0]), wire_fisheye([0.03]),
            ),
            4: colmap_io.ColmapCamera(
                4, "RADIAL_FISHEYE", 64, 48, np.array([40.0, 40.0]),
                np.array([32.0, 24.0]), wire_fisheye([0.03, -0.011]),
            ),
            5: colmap_io.ColmapCamera(
                5, "FOV", 64, 48, np.array([40.0, 42.0]),
                np.array([32.0, 24.0]), wire_fov(0.9),
            ),
            6: colmap_io.ColmapCamera(
                6, "THIN_PRISM_FISHEYE", 64, 48, np.array([40.0, 42.0]),
                np.array([32.0, 24.0]), wire_thin_prism(TPF_K8),
            ),
        }
        p = tmp_path / "cameras.txt"
        colmap_io.write_cameras_txt(str(p), cams)
        back = colmap_io.read_cameras_txt(str(p))
        for cid, cam in cams.items():
            assert back[cid].model == cam.model
            np.testing.assert_allclose(
                back[cid].distortion, cam.distortion, atol=1e-7
            )
            np.testing.assert_allclose(
                back[cid].focal_lengths, cam.focal_lengths
            )

    def test_unknown_model_id_rejected(self, tmp_path):
        p = tmp_path / "cameras.bin"
        self._write_bin(p, 11, np.zeros(12))  # beyond COLMAP's model zoo
        with pytest.raises(colmap_io.ColmapError):
            colmap_io.read_cameras_bin(str(p))


class TestCameraWire:
    def test_ctor_accepts_extended_wire(self):
        cam = Camera(
            np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
            distortion=wire_fisheye(FISH_K4),
        )
        assert cam.distortion.shape == (9,)
        with pytest.raises(ValueError, match="distortion"):
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
                   distortion=np.zeros(10))

    def test_ctor_pads_5_to_extended_radtan(self):
        """5..8 params pad onto the extended wire with selector 0 — the
        slots beyond p2 are the rational k3..k6."""
        cam = Camera(
            np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
            distortion=[0.1, -0.02, 0.003, 0.001, 0.0005],
        )
        np.testing.assert_allclose(
            cam.distortion, [0.1, -0.02, 0.003, 0.001, 0.0005, 0, 0, 0, 0]
        )

    def test_stack_distortions_pads_mixed_batch(self):
        cams = [
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
                   distortion=[0.1]),
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
                   distortion=wire_fisheye(FISH_K4)),
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24]),
        ]
        d = stack_distortions(cams)
        assert d.shape == (3, 9)
        np.testing.assert_allclose(d[0], [0.1, 0, 0, 0, 0, 0, 0, 0, 0])
        np.testing.assert_allclose(d[1], wire_fisheye(FISH_K4))
        assert not np.any(d[2])

    def test_stack_distortions_classic_batch_stays_4(self):
        """An all-classic batch keeps the (N, 4) wire so existing compiled
        programs (jit keys include the dist shape) are untouched."""
        cams = [
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24],
                   distortion=[0.1]),
            Camera(np.eye(3), np.zeros(3), (64, 48), [40, 40], [32, 24]),
        ]
        assert stack_distortions(cams).shape == (2, 4)


# --------------------------------------------------------------------------
# rendering + fusion with extended lenses
# --------------------------------------------------------------------------


class _Mesh:
    def __init__(self, vertices, faces):
        self.vertices = np.asarray(vertices, np.float32)
        self.faces = np.asarray(faces, np.int32)


def scene():
    vertices = np.array(
        [
            [-2.0, -2.0, 4.0], [2.5, -2.0, 4.0], [0.0, 2.5, 4.0],
            [-1.0, -1.5, 3.0], [1.5, -0.5, 3.0], [-0.5, 1.5, 3.0],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return _Mesh(vertices, faces)


def make_camera(distortion=None, width=96, height=72, f=60.0):
    return Camera(
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        (width, height), [f, f], [width / 2, height / 2],
        distortion=distortion,
    )


class TestExtendedLensRender:
    def test_fisheye_render_matches_normalized_space_oracle(self):
        """Fisheye render == brute-force z-buffer at each distorted
        pixel's oracle-undistorted ray (bisection inversion, independent
        of the jax Newton), up to nearest-resample edge quantization."""
        mesh = scene()
        r = render_mod.triangles(mesh)
        cam = make_camera(distortion=wire_fisheye(FISH_K4))
        idx, dep = r.render(cam)
        idx = np.asarray(idx).T  # (H, W)
        dep = np.asarray(dep).T

        h, w = cam.height, cam.width
        ys, xs = np.mgrid[0:h, 0:w]
        nd = np.stack(
            [
                (xs + 0.5 - cam.principal_point[0]) / cam.focal_lengths[0],
                (ys + 0.5 - cam.principal_point[1]) / cam.focal_lengths[1],
            ],
            axis=-1,
        ).astype(np.float64)

        # oracle inversion: bisection on the monotone radial response
        rd = np.sqrt((nd**2).sum(-1))
        lo = np.zeros_like(rd)
        hi = np.full_like(rd, 20.0)
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            th = np.arctan(mid)
            poly = 1 + FISH_K4[0] * th**2 + FISH_K4[1] * th**4 \
                + FISH_K4[2] * th**6 + FISH_K4[3] * th**8
            val = th * poly
            take = val < rd
            lo = np.where(take, mid, lo)
            hi = np.where(take, hi, mid)
        r_u = 0.5 * (lo + hi)
        n = nd * (r_u / np.maximum(rd, 1e-12))[..., None]

        verts = mesh.vertices
        best_z = np.full((h, w), np.inf)
        best_i = np.full((h, w), -1)
        for t, f in enumerate(mesh.faces):
            tri = verts[f]
            pn = tri[:, :2] / tri[:, 2:3]
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
            f"{mismatch.sum()} of {mismatch.size} pixels disagree"
        )
        both = (got >= 0) & (best_i >= 0) & ~mismatch
        np.testing.assert_allclose(dep[both], best_z[both], rtol=5e-3)

    def test_render_many_mixed_wire_batch(self):
        """A camera batch mixing fisheye, FOV, classic radial and pinhole
        rides the (N, 9) wire and must match per-view renders."""
        mesh = scene()
        r = render_mod.triangles(mesh)
        cams = [
            make_camera(distortion=wire_fisheye(FISH_K4 * 0.5)),
            make_camera(distortion=wire_fov(0.7)),
            make_camera(distortion=wire_thin_prism(TPF_K8)),
            make_camera(distortion=[0.12]),
            make_camera(),
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

    def test_fuse_views_extended_equals_per_view(self):
        from semantic_meshes import distributed, testing
        from semantic_meshes.fusion import MeshAggregator

        mesh = scene()
        r = render_mod.triangles(mesh)
        cams = [
            make_camera(distortion=wire_fisheye(FISH_K4)),
            make_camera(distortion=wire_fov(0.8)),
            make_camera(distortion=wire_thin_prism(TPF_K8)),
            make_camera(distortion=[0.1]),
            make_camera(),
        ]
        P, C = r.getPrimitivesNum(), 4
        W, H = cams[0].resolution
        rng = np.random.default_rng(11)
        probs = np.stack(
            [testing.random_probs(rng, H, W, C, dont_care_frac=0.1)
             for _ in cams]
        )
        agg = MeshAggregator(
            primitives=P, classes=C, aggregator="sum",
            images_equal_weight=0.5,
        )
        for cam, pr in zip(cams, probs):
            idx, _ = r.render(cam)
            agg.add(idx, pr.transpose(1, 0, 2))
        want = np.asarray(agg.state)
        rot, trans, fl, pp = stack_cameras(cams)
        acc, overflow = distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=stack_distortions(cams),
            num_primitives=P, aggregator="sum", height=H, width=W,
        )
        assert int(overflow) == 0
        np.testing.assert_allclose(
            np.asarray(acc), want, rtol=2e-5, atol=1e-5
        )

    def test_colmap_fisheye_workspace_end_to_end(self, tmp_path):
        """A synthetic OPENCV_FISHEYE COLMAP workspace loads and drives
        render — the real-workspace entry path for fisheye captures."""
        from semantic_meshes.data import Colmap, Ply
        from semantic_meshes.io import ply as ply_io

        mesh = scene()
        ply_io.write_mesh(
            str(tmp_path / "mesh.ply"), mesh.vertices, mesh.faces,
            np.zeros((2, 3), np.uint8),
        )
        with open(tmp_path / "cameras.txt", "w") as f:
            f.write("# cameras\n")
            f.write(
                "1 OPENCV_FISHEYE 96 72 60.0 60.0 48.0 36.0 "
                "0.03 -0.011 0.002 -0.0005\n"
            )
        with open(tmp_path / "images.txt", "w") as f:
            f.write("1 1 0 0 0 0 0 0 1 view0.png\n\n")
        workspace = Colmap(str(tmp_path))
        cam = workspace.getCamera(0)
        assert cam.distortion.shape == (9,)
        assert cam.distortion[8] == geometry.LENS_FISHEYE
        r = render_mod.triangles(Ply(str(tmp_path / "mesh.ply")))
        idx, dep = r.render(cam)
        arr = np.asarray(idx)
        fg = arr != 0xFFFFFFFF
        assert fg.mean() > 0.2
        assert arr[fg].max() < r.getPrimitivesNum()

    def test_colmap_thin_prism_workspace_end_to_end(self, tmp_path):
        """A synthetic THIN_PRISM_FISHEYE workspace (the last COLMAP
        model to land) loads and drives render."""
        from semantic_meshes.data import Colmap, Ply
        from semantic_meshes.io import ply as ply_io

        mesh = scene()
        ply_io.write_mesh(
            str(tmp_path / "mesh.ply"), mesh.vertices, mesh.faces,
            np.zeros((2, 3), np.uint8),
        )
        params = " ".join(repr(float(v)) for v in TPF_K8)
        with open(tmp_path / "cameras.txt", "w") as f:
            f.write("# cameras\n")
            f.write(
                f"1 THIN_PRISM_FISHEYE 96 72 60.0 60.0 48.0 36.0 {params}\n"
            )
        with open(tmp_path / "images.txt", "w") as f:
            f.write("1 1 0 0 0 0 0 0 1 view0.png\n\n")
        workspace = Colmap(str(tmp_path))
        cam = workspace.getCamera(0)
        assert cam.distortion.shape == (9,)
        assert cam.distortion[8] == geometry.LENS_THIN_PRISM
        r = render_mod.triangles(Ply(str(tmp_path / "mesh.ply")))
        idx, dep = r.render(cam)
        arr = np.asarray(idx)
        fg = arr != 0xFFFFFFFF
        assert fg.mean() > 0.2
        assert arr[fg].max() < r.getPrimitivesNum()


class TestLensWireRobustness:
    def test_undistort_grid_finite_for_random_wires(self):
        """Property: for random parameter draws across every selector —
        including nonsensical magnitudes a corrupt workspace could carry —
        _undistort_grid must return finite ray coords and a scale in
        (0, 1]: the Newton clamp + monotone-radius cap keep one bad lens
        from poisoning a whole batch render with nan/inf."""
        import jax.numpy as jnp

        rng = np.random.default_rng(42)
        fl = jnp.asarray([60.0, 60.0])
        pp = jnp.asarray([48.0, 36.0])
        for trial in range(24):
            d = np.zeros(9, np.float32)
            sel = trial % 4
            if sel == 0:
                d[:8] = rng.uniform(-0.5, 0.5, 8)
            elif sel == 1:
                d[:4] = rng.uniform(-0.5, 0.5, 4)
                d[8] = geometry.LENS_FISHEYE
            elif sel == 2:
                d[0] = rng.uniform(0.01, 1.5)
                d[8] = geometry.LENS_FOV
            else:
                d[:8] = rng.uniform(-0.3, 0.3, 8)
                d[8] = geometry.LENS_THIN_PRISM
            n, s = render_mod._undistort_grid(
                fl, pp, jnp.asarray(d), height=72, width=96
            )
            n, s = np.asarray(n), float(s)
            assert np.isfinite(n).all(), (trial, d)
            assert 0.0 < s <= 1.0, (trial, d, s)


def test_fuse_views_texels_extended_equals_per_view():
    """Texel-mode one-program fusion on the extended wire (fisheye + FOV
    mixed with classic + pinhole) == per-view render + add."""
    from semantic_meshes import distributed, testing
    from semantic_meshes.fusion import MeshAggregator

    mesh = scene()
    cams = [
        make_camera(distortion=wire_fisheye(FISH_K4)),
        make_camera(distortion=wire_fov(0.8)),
        make_camera(distortion=wire_thin_prism(TPF_K8)),
        make_camera(distortion=[0.1]),
        make_camera(),
    ]
    r = render_mod.texels(mesh, cams, texels_per_pixel=0.05)
    P, C = r.getPrimitivesNum(), 3
    W, H = cams[0].resolution
    rng = np.random.default_rng(13)
    probs = np.stack([testing.random_probs(rng, H, W, C) for _ in cams])
    agg = MeshAggregator(
        primitives=P, classes=C, aggregator="sum", images_equal_weight=0.5,
    )
    for cam, pr in zip(cams, probs):
        idx, _ = r.render(cam)
        agg.add(idx, pr.transpose(1, 0, 2))
    want = np.asarray(agg.state)
    rot, trans, fl, pp = stack_cameras(cams)
    acc, overflow = distributed.fuse_views_texels(
        r.vertices, r.faces, r.resolutions, r.first_texel_index,
        rot, trans, fl, pp, probs, np.float32(0.5),
        distortions=stack_distortions(cams),
        num_primitives=P, aggregator="sum", height=H, width=W,
    )
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(acc), want, rtol=2e-5, atol=1e-5)


class TestSharedLensHoist:
    """shared_lens=True hoists the undistortion grid out of the per-view
    scan (all views share one physical camera — the normal COLMAP case).
    The grid values are identical either way, so outputs must be
    BIT-identical; plan_fuse detects the condition host-side."""

    def _setup(self, wire):
        from semantic_meshes import testing

        mesh = scene()
        cams = [make_camera(distortion=wire) for _ in range(4)]
        rng = np.random.default_rng(21)
        W, H = cams[0].resolution
        probs = np.stack([testing.random_probs(rng, H, W, 3) for _ in cams])
        return mesh, cams, probs

    @pytest.mark.parametrize(
        "wire", [np.array([0.1, -0.02, 0, 0], np.float32),
                 wire_fisheye(FISH_K4)],
        ids=["classic", "fisheye"],
    )
    def test_fuse_views_shared_equals_per_view_grid(self, wire):
        from semantic_meshes import distributed

        mesh, cams, probs = self._setup(wire)
        rot, trans, fl, pp = stack_cameras(cams)
        dists = stack_distortions(cams)
        W, H = cams[0].resolution
        kw = dict(num_primitives=len(mesh.faces), aggregator="sum",
                  height=H, width=W)
        assert distributed.lens_shared(fl, pp, dists)
        a, ov_a = distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=dists, shared_lens=True, **kw,
        )
        b, ov_b = distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=dists, **kw,
        )
        assert int(ov_a) == int(ov_b) == 0
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_lens_shared_detection(self):
        from semantic_meshes import distributed

        mesh, cams, probs = self._setup(wire_fisheye(FISH_K4))
        rot, trans, fl, pp = stack_cameras(cams)
        dists = stack_distortions(cams)
        assert distributed.lens_shared(fl, pp, dists)
        assert not distributed.lens_shared(fl, pp, None)
        mixed = dists.copy()
        mixed[1, 0] += 0.01
        assert not distributed.lens_shared(fl, pp, mixed)
        fl2 = fl.copy()
        fl2[2, 0] += 1.0
        assert not distributed.lens_shared(fl2, pp, dists)

    def test_plan_fuse_carries_lens_shared(self):
        from semantic_meshes import distributed

        mesh, cams, probs = self._setup(wire_fisheye(FISH_K4))
        rot, trans, fl, pp = stack_cameras(cams)
        dists = stack_distortions(cams)
        W, H = cams[0].resolution
        plan = distributed.plan_fuse(
            mesh.vertices, mesh.faces, rot, trans, fl, pp,
            height=H, width=W, distortions=dists,
        )
        assert plan.lens_shared
        acc, ov = distributed.fuse_views_planned(
            plan, mesh.vertices, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=dists,
            num_primitives=len(mesh.faces), aggregator="sum",
            height=H, width=W,
        )
        ref, _ = distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=dists,
            num_primitives=len(mesh.faces), aggregator="sum",
            height=H, width=W,
        )
        assert int(ov) == 0
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref))

    def test_sharded_shared_lens_matches_single_chip(self):
        import jax
        from jax.sharding import Mesh as DevMesh

        from semantic_meshes import distributed

        devices = np.array(jax.devices())
        if devices.size < 4:
            pytest.skip("needs 4 devices (virtual cpu mesh)")
        dev_mesh = DevMesh(devices[:4].reshape(4, 1), ("views", "pixels"))
        mesh, cams, probs = self._setup(wire_fisheye(FISH_K4))
        rot, trans, fl, pp = stack_cameras(cams)
        dists = stack_distortions(cams)
        W, H = cams[0].resolution
        kw = dict(num_primitives=len(mesh.faces), aggregator="sum",
                  height=H, width=W)
        ref = np.asarray(distributed.fuse_views(
            mesh.vertices, mesh.faces, rot, trans, fl, pp, probs,
            np.float32(0.5), distortions=dists, **kw,
        )[0])
        fuse = distributed.make_sharded_fuse(
            dev_mesh, with_distortion=True, shared_lens=True, **kw
        )
        with dev_mesh:
            got = np.asarray(
                fuse(mesh.vertices, mesh.faces, rot, trans, fl, pp,
                     probs, np.float32(0.5), dists)[0]
            )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


class TestWideLensGrid:
    """The extended wire's per-pixel exact clamp (code-review round-5
    finding): wide fisheye/FOV undistorted radii are tan-like and blow
    past the classic 3x-corner heuristic — every VALID pixel's grid ray
    must forward-distort back onto its own pixel center, and no-ray
    pixels (beyond the lens's producible response) must not shrink the
    virtual focal for everyone else."""

    def test_170deg_fisheye_grid_inverts_exactly(self):
        import jax.numpy as jnp

        W, H = 96, 72
        f = 41.0  # corner r_d = 60/41 ~ 1.46 -> true radius tan(1.46) ~ 9.0
        dist = wire_fisheye(np.zeros(4))
        fl = jnp.asarray([f, f]); pp = jnp.asarray([W / 2, H / 2])
        n, s = render_mod._undistort_grid(fl, pp, jnp.asarray(dist),
                                          height=H, width=W)
        n = np.asarray(n)
        ys, xs = np.mgrid[0:H, 0:W]
        nd = np.stack([(xs + 0.5 - W / 2) / f, (ys + 0.5 - H / 2) / f], -1)
        r_d = np.sqrt((nd**2).sum(-1))
        # corner rays really are in the blow-up regime the old 3x cap bit
        assert np.tan(r_d.max()) > 3.0 * r_d.max()
        back = np.asarray(geometry.distort_normalized(n, dist))
        err = np.abs(back - nd).max()
        assert err < 5e-3, err  # every ray inverts (sampled-inverse step)
        # the virtual pinhole really contains the corner ray
        assert float(s) * f * np.tan(r_d.max()) <= np.hypot(W, H) / 2 + 1

    def test_no_ray_corners_do_not_shrink_focal(self):
        import jax.numpy as jnp

        W, H = 96, 72
        f = 25.0  # corner r_d = 60/25 = 2.4 > the zero-k fisheye's max
        dist = wire_fisheye(np.zeros(4))  # producible response < 1.55
        fl = jnp.asarray([f, f]); pp = jnp.asarray([W / 2, H / 2])
        n, s = render_mod._undistort_grid(fl, pp, jnp.asarray(dist),
                                          height=H, width=W)
        assert np.isfinite(np.asarray(n)).all()
        # s is set by the valid pixels (theta < ~1.55 rays), not the
        # impossible corners: the largest valid ray has radius
        # ~tan(1.55 * 0.999); containment needs roughly f*s*r <= W/2
        r_max_valid = np.tan(1.55 * 0.999)
        s_expect = (W / 2) / (f * r_max_valid)
        assert float(s) > 0.5 * s_expect, (float(s), s_expect)
