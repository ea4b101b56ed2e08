import numpy as np
import pytest

flax = pytest.importorskip("flax")

from semantic_meshes.models import segmentation  # noqa: E402


def test_unet_predictor_shapes_and_softmax():
    predict = segmentation.load_predictor(
        classes=7, input_hw=(64, 64), widths=(16, 32, 64)
    )
    img = np.random.default_rng(0).integers(
        0, 256, (50, 70, 3)
    ).astype(np.uint8)
    probs = np.asarray(predict(img))
    assert probs.shape == (50, 70, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
    assert (probs >= 0).all()


def test_unet_grayscale_and_rgba():
    predict = segmentation.load_predictor(
        classes=4, input_hw=(32, 32), widths=(8, 16, 32)
    )
    gray = np.zeros((40, 40), np.uint8)
    assert np.asarray(predict(gray)).shape == (40, 40, 4)
    rgba = np.zeros((40, 40, 4), np.uint8)
    assert np.asarray(predict(rgba)).shape == (40, 40, 4)


def test_rgbd_predictor():
    predict = segmentation.load_rgbd_predictor(
        classes=5, input_hw=(32, 32), widths=(8, 16, 32)
    )
    rng = np.random.default_rng(1)
    color = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    depth = rng.integers(0, 5000, (24, 32)).astype(np.uint16)  # lower res
    probs = np.asarray(predict(color, depth))
    assert probs.shape == (48, 64, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_device_mesh_helper():
    import jax

    from semantic_meshes import distributed

    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    mesh = distributed.make_device_mesh(pixels_axis=2)
    assert mesh.shape["views"] * mesh.shape["pixels"] == n
    with pytest.raises(ValueError):
        distributed.make_device_mesh(views_axis=3, pixels_axis=n)


def test_pspnet_predictor():
    predict = segmentation.load_predictor(
        classes=6, input_hw=(64, 64), widths=(8, 16, 32, 32), arch="pspnet"
    )
    img = np.zeros((48, 80, 3), np.uint8)
    probs = np.asarray(predict(img))
    assert probs.shape == (48, 80, 6)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_render_many_matches_single():
    import semantic_meshes
    from semantic_meshes import testing
    from semantic_meshes.io.ply import write_mesh
    import tempfile, os

    vertices, faces = testing.make_cube(4)
    d = tempfile.mkdtemp()
    write_mesh(os.path.join(d, "c.ply"), vertices, faces)
    mesh = semantic_meshes.data.Ply(os.path.join(d, "c.ply"))
    renderer = semantic_meshes.render.triangles(mesh)
    cams = testing.make_ring_cameras(num_views=3, width=128, height=96)
    idx_b, depth_b = renderer.render_many(cams)
    for i, cam in enumerate(cams):
        idx, depth = renderer.render(cam)
        np.testing.assert_array_equal(np.asarray(idx_b[i]), np.asarray(idx))
        np.testing.assert_array_equal(
            np.asarray(depth_b[i]), np.asarray(depth)
        )


def test_texels_render_many_matches_single():
    import semantic_meshes
    from semantic_meshes import testing
    from semantic_meshes.io.ply import write_mesh
    import tempfile, os

    vertices, faces = testing.make_cube(3)
    d = tempfile.mkdtemp()
    write_mesh(os.path.join(d, "c.ply"), vertices, faces)
    mesh = semantic_meshes.data.Ply(os.path.join(d, "c.ply"))
    cams = testing.make_ring_cameras(num_views=3, width=128, height=96)
    renderer = semantic_meshes.render.texels(mesh, cams, 1.5)
    idx_b, depth_b = renderer.render_many(cams)
    for i, cam in enumerate(cams):
        idx, depth = renderer.render(cam)
        np.testing.assert_array_equal(np.asarray(idx_b[i]), np.asarray(idx))
        np.testing.assert_array_equal(
            np.asarray(depth_b[i]), np.asarray(depth)
        )
