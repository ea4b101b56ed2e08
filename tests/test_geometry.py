import numpy as np
import pytest

from semantic_meshes import geometry


def rand_unit_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_identity(self):
        r = np.asarray(geometry.quaternion_to_rotation([1.0, 0, 0, 0]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_rotation_properties(self):
        rng = np.random.default_rng(0)
        q = rand_unit_quat(rng, (32,))
        r = np.asarray(geometry.quaternion_to_rotation(q))
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)

    def test_known_z_rotation(self):
        # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
        s = np.sin(np.pi / 4)
        r = np.asarray(geometry.quaternion_to_rotation([s, 0, 0, s]))
        np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-6)

    def test_composition(self):
        rng = np.random.default_rng(1)
        q1, q2 = rand_unit_quat(rng), rand_unit_quat(rng)
        # Hamilton product
        w1, x1, y1, z1 = q1
        w2, x2, y2, z2 = q2
        q12 = np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])
        r12 = np.asarray(geometry.quaternion_to_rotation(q12))
        r1 = np.asarray(geometry.quaternion_to_rotation(q1))
        r2 = np.asarray(geometry.quaternion_to_rotation(q2))
        np.testing.assert_allclose(r12, r1 @ r2, atol=1e-5)


class TestRigidAndProjection:
    def test_rigid_transform(self):
        rng = np.random.default_rng(2)
        r = np.asarray(
            geometry.quaternion_to_rotation(rand_unit_quat(rng))
        ).astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        p = rng.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(geometry.rigid_transform(r, t, p))
        np.testing.assert_allclose(out, p @ r.T + t, atol=1e-5)

    def test_rigid_transform_single_point(self):
        r = np.eye(3, dtype=np.float32)
        t = np.array([1, 2, 3], np.float32)
        out = np.asarray(geometry.rigid_transform(r, t, np.zeros(3, np.float32)))
        np.testing.assert_allclose(out, t)

    def test_pinhole(self):
        f = np.array([100.0, 200.0], np.float32)
        c = np.array([320.0, 240.0], np.float32)
        pts = np.array([[0, 0, 1], [1, 1, 2]], np.float32)
        out = np.asarray(geometry.pinhole_project(f, c, pts))
        np.testing.assert_allclose(out[0], c, atol=1e-5)
        np.testing.assert_allclose(out[1], [100 * 0.5 + 320, 200 * 0.5 + 240],
                                   atol=1e-4)

    def test_look_at_points_forward(self):
        r, t = geometry.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])
        target_cam = r @ np.zeros(3) + t
        np.testing.assert_allclose(target_cam, [0, 0, 4], atol=1e-6)
        assert target_cam[2] > 0  # looking down +z


class TestBarycentric:
    def test_vertices_and_center(self):
        a, b, c = (np.array([0.0, 0.0]), np.array([2.0, 0.0]),
                   np.array([0.0, 2.0]))
        np.testing.assert_allclose(
            np.asarray(geometry.barycentric_2d(a, a, b, c)), [1, 0, 0],
            atol=1e-6,
        )
        center = (a + b + c) / 3
        np.testing.assert_allclose(
            np.asarray(geometry.barycentric_2d(center, a, b, c)),
            [1 / 3] * 3, atol=1e-6,
        )

    def test_perspective_correct_midpoint(self):
        # screen midpoint of an edge with z0=1, z1=3 lies at 3D parameter
        # t = z0/(z0+z1) = 0.25 -> bary (0.75, 0.25), depth 1.5
        b2 = np.array([0.5, 0.5, 0.0], np.float32)
        z = np.array([1.0, 3.0, 1.0], np.float32)
        b3, depth = geometry.perspective_correct(b2, z)
        np.testing.assert_allclose(np.asarray(b3), [0.75, 0.25, 0.0],
                                   atol=1e-6)
        np.testing.assert_allclose(float(depth), 1.5, atol=1e-6)


class TestTexelIndex:
    @pytest.mark.parametrize("r", [1, 2, 3, 7, 16])
    def test_count_identity(self, r):
        assert int(geometry.texel_count(r)) == r * (r + 1) // 2

    @pytest.mark.parametrize("r", [1, 2, 3, 5, 11])
    def test_bijection_over_grid(self, r):
        # sample each in-triangle cell at its centroid: every texel index in
        # [0, r(r+1)/2) must be hit exactly once
        hits = set()
        for iu in range(r):
            for iv in range(r - iu):
                u = (iu + 1 / 3) / r
                v = (iv + 1 / 3) / r
                bary = np.array([1 - u - v, u, v], np.float32)
                idx = int(geometry.texel_index(bary, np.int32(r)))
                assert 0 <= idx < r * (r + 1) // 2
                hits.add(idx)
        assert len(hits) == r * (r + 1) // 2

    def test_hypotenuse_stays_in_range(self):
        r = 4
        for t in np.linspace(0, 1, 23):
            bary = np.array([0.0, t, 1.0 - t], np.float32)
            idx = int(geometry.texel_index(bary, np.int32(r)))
            assert 0 <= idx < r * (r + 1) // 2


def _reorder_oracle(vertices, face):
    """Direct per-triangle transcription of TexturedTriangleRenderer.h:129-146."""
    face = list(face)

    def angle(v1, v2):
        cosang = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
        return np.arccos(np.clip(cosang, -1, 1))

    diffs = []
    for i in range(3):
        a = vertices[face[i % 3]]
        b = vertices[face[(i + 1) % 3]]
        c = vertices[face[(i + 2) % 3]]
        diffs.append(abs(angle(b - a, c - a) - np.pi / 2))
    best = int(np.argmin(diffs))
    if best != 0:
        face[0], face[best] = face[best], face[0]
        diffs[0], diffs[best] = diffs[best], diffs[0]
    if diffs[1] >= diffs[2]:
        face[1], face[2] = face[2], face[1]
    return face


class TestReorderFaces:
    def test_matches_oracle(self):
        rng = np.random.default_rng(3)
        vertices = rng.normal(size=(30, 3)).astype(np.float32)
        faces = np.stack(
            [rng.choice(30, size=3, replace=False) for _ in range(40)]
        ).astype(np.int32)
        out = np.asarray(
            geometry.reorder_faces_for_texels(vertices, faces)
        )
        expected = np.asarray(
            [_reorder_oracle(vertices, f) for f in faces], np.int32
        )
        np.testing.assert_array_equal(out, expected)

    def test_right_angle_goes_first(self):
        vertices = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        out = np.asarray(
            geometry.reorder_faces_for_texels(
                vertices, np.array([[1, 0, 2]], np.int32)
            )
        )
        assert out[0][0] == 0  # the right angle is at vertex 0


class TestReorderDegenerate:
    def test_degenerate_triangle_no_nan(self):
        # two identical vertices -> zero-length edges
        vertices = np.array(
            [[0, 0, 0], [0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        out = np.asarray(
            geometry.reorder_faces_for_texels(vertices, faces)
        )
        # a permutation of each input face, no garbage indices
        for i in range(2):
            assert sorted(out[i].tolist()) == sorted(faces[i].tolist())
