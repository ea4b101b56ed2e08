"""Property tests: all rasterizer backends agree with the brute-force
z-buffer oracle across random scenes, cameras, and edge conditions."""

import numpy as np
import pytest

from semantic_meshes import geometry
from semantic_meshes.rasterize import dense, pallas_kernel, xla


def brute_force(vertices, faces, rot, trans, fl, pp, h, w):
    pix, z = xla.project_vertices(
        vertices.astype(np.float32), rot, trans, fl, pp
    )
    pix, z = np.asarray(pix), np.asarray(z)
    best_z = np.full((h, w), np.inf, np.float32)
    best_i = np.full((h, w), -1, np.int64)
    ys, xs = np.mgrid[0:h, 0:w]
    pts = np.stack([xs + 0.5, ys + 0.5], -1).astype(np.float32)
    for t in range(len(faces)):
        f = faces[t]
        if np.any(z[f] <= xla.Z_NEAR):
            continue
        a, b, c = pix[f[0]], pix[f[1]], pix[f[2]]
        denom = float(np.asarray(geometry.signed_area2(a, b, c)))
        if denom == 0:
            continue
        bary = np.asarray(geometry.barycentric_2d(pts, a, b, c))
        inside = np.all(bary >= 0, axis=-1)
        inv_z = bary @ (1.0 / z[f])
        zz = 1.0 / inv_z
        ok = inside & (inv_z > 0) & (zz < best_z)
        best_z = np.where(ok, zz, best_z)
        best_i = np.where(ok, t, best_i)
    return best_i, best_z


def random_camera(rng, w, h):
    # random orientation looking roughly at the origin from distance 4-6
    direction = rng.normal(size=3)
    direction /= np.linalg.norm(direction)
    eye = -direction * rng.uniform(4, 6)
    up = rng.normal(size=3)
    rot, trans = geometry.look_at(eye, [0, 0, 0], up)
    f = rng.uniform(30, 90)
    return (
        rot, trans,
        np.array([f, f * rng.uniform(0.8, 1.2)], np.float32),
        np.array(
            [w / 2 + rng.uniform(-5, 5), h / 2 + rng.uniform(-5, 5)],
            np.float32,
        ),
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_backends_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    h, w = 64, 128
    V = 50
    vertices = (rng.normal(size=(V, 3)) * rng.uniform(0.1, 2)).astype(
        np.float32
    )
    faces = rng.integers(0, V, size=(35, 3)).astype(np.int32)
    rot, trans, fl, pp = random_camera(rng, w, h)
    args = (vertices, faces, rot, trans, fl, pp)

    ref_i, ref_z = brute_force(vertices, faces, rot, trans, fl, pp, h, w)
    for mod in (xla, pallas_kernel, dense):
        tri, depth, _ = mod.rasterize(*args, height=h, width=w)
        tri, depth = np.asarray(tri), np.asarray(depth)
        mismatch = tri != ref_i
        # tolerate a tiny fraction of fp-association edge pixels
        assert mismatch.mean() < 0.003, (
            f"{mod.__name__}: {mismatch.sum()} mismatching pixels"
        )
        both = (tri >= 0) & ~mismatch
        if both.any():
            np.testing.assert_allclose(
                depth[both], ref_z[both], rtol=2e-4
            )


def test_near_plane_crossing_consistent():
    """Triangles crossing z=0 are culled identically by every backend."""
    vertices = np.array(
        [
            [-1, -1, 2], [1, -1, 2], [0, 1, -1],   # crosses near plane
            [-1, -1, 3], [1, -1, 3], [0, 1, 3],    # fully in front
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    cam = (
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        np.array([40.0, 40.0], np.float32), np.array([64.0, 32.0], np.float32),
    )
    results = []
    for mod in (xla, pallas_kernel, dense):
        tri, _, _ = mod.rasterize(vertices, faces, *cam, height=64, width=128)
        tri = np.asarray(tri)
        assert not (tri == 0).any()  # crossing triangle culled
        assert (tri == 1).any()  # in-front triangle rendered
        results.append(tri)
    np.testing.assert_array_equal(results[0], results[1])
    np.testing.assert_array_equal(results[0], results[2])


def test_huge_coordinates_no_nan_poisoning():
    """Distant geometry must not poison valid geometry via inf/nan."""
    vertices = np.array(
        [
            [-1e8, -1e8, 1e8], [1e8, -1e8, 1e8], [0, 1e8, 1e8],
            [-0.5, -0.5, 2], [0.5, -0.5, 2], [0, 0.75, 2],
        ],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    cam = (
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        np.array([40.0, 40.0], np.float32), np.array([64.0, 32.0], np.float32),
    )
    for mod in (xla, dense):
        tri, depth, _ = mod.rasterize(
            vertices, faces, *cam, height=64, width=128
        )
        tri = np.asarray(tri)
        assert (tri == 1).any()  # near triangle still rendered
        d = np.asarray(depth)
        assert np.isfinite(d[tri == 1]).all()
