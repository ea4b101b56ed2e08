import numpy as np

from semantic_meshes import geometry
from semantic_meshes.rasterize import xla as rast


def simple_camera(width=64, height=48, f=40.0):
    rotation = np.eye(3, dtype=np.float32)
    translation = np.zeros(3, np.float32)
    focal = np.array([f, f], np.float32)
    pp = np.array([width / 2, height / 2], np.float32)
    return rotation, translation, focal, pp, height, width


def render(vertices, faces, cam, **kw):
    rotation, translation, focal, pp, height, width = cam
    tri, depth, overflow = rast.rasterize(
        np.asarray(vertices, np.float32),
        np.asarray(faces, np.int32),
        rotation, translation, focal, pp,
        height=height, width=width, **kw,
    )
    return np.asarray(tri), np.asarray(depth), int(overflow)


class TestSingleTriangle:
    def test_covers_center_with_correct_depth(self):
        cam = simple_camera()
        # triangle at z=2 covering the image center but not the corners
        vertices = [[-0.5, -0.5, 2], [0.5, -0.5, 2], [0, 0.75, 2]]
        tri, depth, _ = render(vertices, [[0, 1, 2]], cam)
        h, w = depth.shape
        assert tri[h // 2, w // 2] == 0
        np.testing.assert_allclose(depth[h // 2, w // 2], 2.0, atol=1e-5)
        # pixels far outside are empty
        assert tri[0, 0] == -1
        assert np.isinf(depth[0, 0])

    def test_winding_invariant(self):
        cam = simple_camera()
        vertices = [[-2, -2, 2], [2, -2, 2], [0, 3, 2]]
        tri_a, _, _ = render(vertices, [[0, 1, 2]], cam)
        tri_b, _, _ = render(vertices, [[0, 2, 1]], cam)
        np.testing.assert_array_equal(tri_a, tri_b)

    def test_behind_camera_culled(self):
        cam = simple_camera()
        vertices = [[-2, -2, -2], [2, -2, -2], [0, 3, -2]]
        tri, depth, _ = render(vertices, [[0, 1, 2]], cam)
        assert np.all(tri == -1)
        assert np.all(np.isinf(depth))

    def test_slanted_depth_perspective_correct(self):
        cam = simple_camera(width=64, height=64)
        # triangle slanted in depth: z from 1 (left) to 3 (right)
        vertices = [[-2, -4, 1], [6, -12, 3], [-2, 12, 1]]
        tri, depth, _ = render(vertices, [[0, 1, 2]], cam)
        covered = tri == 0
        assert covered.sum() > 50
        # verify analytically: for each covered pixel, the ray through the
        # pixel center must hit the triangle plane at the reported depth
        rotation, translation, focal, pp, h, w = cam
        v = np.asarray(vertices, np.float64)
        n = np.cross(v[1] - v[0], v[2] - v[0])
        d = n @ v[0]
        ys, xs = np.nonzero(covered)
        dirs = np.stack(
            [(xs + 0.5 - pp[0]) / focal[0], (ys + 0.5 - pp[1]) / focal[1],
             np.ones_like(xs, np.float64)], axis=-1,
        )
        t_hit = d / (dirs @ n)
        np.testing.assert_allclose(depth[ys, xs], t_hit, rtol=1e-4)


class TestOcclusion:
    def test_near_triangle_wins(self):
        cam = simple_camera()
        vertices = [
            [-2, -2, 2], [2, -2, 2], [0, 3, 2],      # near, tri 0
            [-2, -2, 4], [2, -2, 4], [0, 3, 4],      # far, tri 1
        ]
        tri, depth, _ = render(vertices, [[0, 1, 2], [3, 4, 5]], cam)
        h, w = depth.shape
        assert tri[h // 2, w // 2] == 0
        # order in the face list must not matter
        tri2, _, _ = render(vertices, [[3, 4, 5], [0, 1, 2]], cam)
        assert tri2[h // 2, w // 2] == 1

    def test_equal_depth_tiebreak_lower_index(self):
        cam = simple_camera()
        vertices = [[-2, -2, 2], [2, -2, 2], [0, 3, 2]]
        faces = [[0, 1, 2], [0, 1, 2], [0, 1, 2]]
        tri, _, _ = render(vertices, faces, cam)
        h, w = tri.shape
        assert tri[h // 2, w // 2] == 0

    def test_deterministic_across_runs(self):
        rng = np.random.default_rng(5)
        vertices = rng.normal(size=(60, 3)).astype(np.float32)
        vertices[:, 2] += 4
        faces = rng.integers(0, 60, size=(40, 3)).astype(np.int32)
        cam = simple_camera()
        tri1, d1, _ = render(vertices, faces, cam)
        tri2, d2, _ = render(vertices, faces, cam)
        np.testing.assert_array_equal(tri1, tri2)
        np.testing.assert_array_equal(d1, d2)


class TestBinning:
    def test_matches_unbinned_bruteforce(self):
        """Tile-binned result == brute-force z-min over all triangles."""
        rng = np.random.default_rng(11)
        V, T = 45, 30
        vertices = rng.normal(size=(V, 3)).astype(np.float32) * 1.5
        vertices[:, 2] += 5
        faces = rng.integers(0, V, size=(T, 3)).astype(np.int32)
        cam = simple_camera(width=160, height=96)
        rotation, translation, focal, pp, h, w = cam
        tri, depth, overflow = render(vertices, faces, cam)
        assert overflow == 0

        # brute force in float32 to match kernel arithmetic
        pix, z = rast.project_vertices(
            vertices, rotation, translation, focal, pp
        )
        pix, z = np.asarray(pix), np.asarray(z)
        best_z = np.full((h, w), np.inf, np.float32)
        best_i = np.full((h, w), -1, np.int64)
        ys, xs = np.mgrid[0:h, 0:w]
        pts = np.stack([xs + 0.5, ys + 0.5], -1).astype(np.float32)
        for t in range(T):
            f = faces[t]
            if np.any(z[f] <= rast.Z_NEAR):
                continue
            a, b, c = pix[f[0]], pix[f[1]], pix[f[2]]
            bary = np.asarray(geometry.barycentric_2d(pts, a, b, c))
            if not np.isfinite(bary).all():
                denom = np.asarray(geometry.signed_area2(a, b, c))
                if denom == 0:
                    continue
            inside = np.all(bary >= 0, axis=-1)
            inv_z = bary @ (1.0 / z[f])
            zz = 1.0 / inv_z
            ok = inside & (inv_z > 0) & (zz < best_z)
            best_z = np.where(ok, zz, best_z)
            best_i = np.where(ok, t, best_i)

        mismatch = (tri != best_i)
        # allow a tiny fraction of edge pixels to differ by fp association
        assert mismatch.mean() < 0.002, f"{mismatch.sum()} mismatching pixels"
        both = (tri >= 0) & (best_i >= 0) & ~mismatch
        np.testing.assert_allclose(depth[both], best_z[both], rtol=1e-4)

    def test_overflow_reported(self):
        # 20 coincident triangles, cap 4 -> overflow must be > 0
        cam = simple_camera(width=32, height=32)
        vertices = np.array(
            [[-2, -2, 2], [2, -2, 2], [0, 3, 2]], np.float32
        )
        faces = np.tile(np.array([[0, 1, 2]], np.int32), (20, 1))
        tri, _, overflow = render(vertices, faces, cam, max_tris_per_tile=4)
        assert overflow > 0
        # the kept triangles are the lowest ids -> winner is still 0
        assert tri[16, 16] == 0

    def test_late_frame_overflow_accumulated(self, tmp_path):
        """The 'first' sync policy checks only the first frame per
        resolution; a LATER frame that breaches the cap must still show up
        in renderer.overflow_total() (async accumulated counter)."""
        import semantic_meshes
        from semantic_meshes.data import Camera
        from semantic_meshes.geometry import look_at
        from semantic_meshes.io.ply import write_mesh

        # 20 coincident view-filling triangles: heavy per-tile load
        vertices = np.tile(
            np.array([[-2, -2, 2], [2, -2, 2], [0, 3, 2]], np.float32),
            (20, 1),
        )
        faces = np.arange(60, dtype=np.int32).reshape(20, 3)
        write_mesh(tmp_path / "m.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "m.ply"))
        r = semantic_meshes.render.triangles(
            mesh, max_tris_per_tile=4, backend="xla", bucket=False
        )
        W = H = 32
        fl = np.array([40.0, 40.0], np.float32)
        pp = np.array([W / 2, H / 2], np.float32)
        # frame 1 looks AWAY from the geometry: zero candidates
        rot_a, t_a = look_at([0, 0, 0.0], [0, 0, -4.0], [0, 1, 0.0])
        cam_away = Camera(rot_a, t_a, (W, H), fl, pp)
        r.render(cam_away)
        assert r.overflow_total() == 0
        # frame 2 (same resolution) sees all 20 -> silent breach before
        rot_b, t_b = look_at([0, 0, 0.0], [0, 0, 4.0], [0, 1, 0.0])
        cam_to = Camera(rot_b, t_b, (W, H), fl, pp)
        r.render(cam_to)
        t1 = r.overflow_total()
        assert t1 > 0
        # counter is cumulative across frames
        r.render(cam_to)
        assert r.overflow_total() == 2 * t1


class TestBarycentricPass:
    def test_bary_sums_to_one_and_matches_depth(self):
        cam = simple_camera()
        rotation, translation, focal, pp, h, w = cam
        vertices = np.array(
            [[-2, -4, 1], [6, -12, 3], [-2, 12, 1]], np.float32
        )
        faces = np.array([[0, 1, 2]], np.int32)
        tri, depth, _ = render(vertices, faces, cam)
        bary = np.asarray(
            rast.barycentrics_at_pixels(
                vertices, faces, rotation, translation, focal, pp, tri
            )
        )
        covered = tri >= 0
        np.testing.assert_allclose(
            bary[covered].sum(-1), 1.0, atol=1e-4
        )
        assert np.all(bary[covered] > -1e-3)
        # reconstruct depth from bary: z = 1 / sum(b_i / z_i) ... but bary3d
        # interpolates z linearly over the surface: z = sum(b3_i * z_i)
        z_vert = np.array([1.0, 3.0, 1.0])
        z_rec = bary[covered] @ z_vert
        np.testing.assert_allclose(z_rec, depth[covered], rtol=1e-4)
