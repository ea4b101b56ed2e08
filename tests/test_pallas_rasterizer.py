"""Pallas rasterizer must be bit-identical to the XLA oracle (interpret mode
on CPU; the same check runs compiled on real TPU via SM_TEST_TPU=1)."""

import numpy as np
import pytest

from semantic_meshes import testing
from semantic_meshes.data import stack_cameras
from semantic_meshes.rasterize import pallas_kernel, xla


@pytest.mark.parametrize("hw", [(96, 128), (64, 256)])
def test_matches_xla_random_scene(hw):
    rng = np.random.default_rng(9)
    vertices = rng.normal(size=(80, 3)).astype(np.float32) * 1.5
    vertices[:, 2] += 5
    faces = rng.integers(0, 80, size=(60, 3)).astype(np.int32)
    h, w = hw
    args = (
        vertices, faces,
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        np.array([50.0, 50.0], np.float32),
        np.array([w / 2, h / 2], np.float32),
    )
    t1, d1, o1 = xla.rasterize(*args, height=h, width=w)
    t2, d2, o2 = pallas_kernel.rasterize(*args, height=h, width=w)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    fin = np.isfinite(np.asarray(d1))
    np.testing.assert_array_equal(fin, np.isfinite(np.asarray(d2)))
    np.testing.assert_allclose(
        np.asarray(d1)[fin], np.asarray(d2)[fin], rtol=1e-6
    )
    assert int(o1) == int(o2)


def test_matches_xla_cube_with_offset():
    vertices, faces = testing.make_cube(5)
    cams = testing.make_ring_cameras(num_views=1, width=128, height=96)
    rot, trans, fl, pp = stack_cameras(cams)
    # row-band rendering: band [32, 64) of the 96-row image
    a1 = xla.rasterize(
        vertices, faces, rot[0], trans[0], fl[0], pp[0],
        np.float32(32.0), height=32, width=128,
    )
    a2 = pallas_kernel.rasterize(
        vertices, faces, rot[0], trans[0], fl[0], pp[0],
        np.float32(32.0), height=32, width=128,
    )
    full = xla.rasterize(
        vertices, faces, rot[0], trans[0], fl[0], pp[0],
        height=96, width=128,
    )
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    # band must equal the corresponding rows of the full image
    np.testing.assert_array_equal(
        np.asarray(a1[0]), np.asarray(full[0])[32:64]
    )
