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


class TestSlidingMultiScale:
    """Sliding-window + multi-scale combinators (the tfcv.predict.sliding /
    multi_scale roles of the reference demo, ref:
    python/scripts/colorize_cityscapes_mesh.py:42-43)."""

    def test_window_starts_cover_and_overlap(self):
        starts = segmentation._window_starts(100, 40, 0.2)
        assert starts[0] == 0 and starts[-1] == 60
        assert all(b - a <= 40 for a, b in zip(starts, starts[1:]))
        assert segmentation._window_starts(30, 40, 0.2) == [0]

    def test_sliding_passthrough_below_window(self):
        base = segmentation.load_predictor(
            classes=4, input_hw=(32, 32), widths=(8, 16, 32)
        )
        slid = segmentation.sliding(base, (64, 64))
        img = np.random.default_rng(0).integers(
            0, 256, (40, 48, 3)).astype(np.uint8)
        np.testing.assert_array_equal(
            np.asarray(slid(img)), np.asarray(base(img))
        )

    def test_sliding_shapes_softmax_and_batched_equals_fallback(self):
        predict = segmentation.load_predictor(
            classes=5, input_hw=(32, 32), widths=(8, 16, 32)
        )
        img = np.random.default_rng(1).integers(
            0, 256, (70, 90, 3)).astype(np.uint8)
        slid = segmentation.sliding(predict, (32, 32), overlap=0.25)
        probs = np.asarray(slid(img))
        assert probs.shape == (70, 90, 5)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
        # per-window fallback (no .batch) must agree with the batched path
        def unbatched(image):
            return predict(image)
        unbatched.params = predict.params
        slow = segmentation.sliding(unbatched, (32, 32), overlap=0.25)
        # On TPU the default conv precision is bf16-class, and the batched
        # (N windows) vs per-window (N=1) programs round differently; only
        # f32 CPU gives near-exact agreement. Measured on v5e (round-4
        # suite run): max |diff| 0.011 on softmax probs, 0.2% of elements
        # past 5e-3 — the bound below has ~2x headroom on that.
        import jax
        atol = 1e-5 if jax.default_backend() == "cpu" else 2.5e-2
        np.testing.assert_allclose(
            probs, np.asarray(slow(img)), atol=atol
        )

    def test_multi_scale_identity_and_average(self):
        base = segmentation.load_predictor(
            classes=4, input_hw=(32, 32), widths=(8, 16, 32)
        )
        img = np.random.default_rng(2).integers(
            0, 256, (40, 40, 3)).astype(np.uint8)
        ms1 = segmentation.multi_scale(base, [1.0])
        np.testing.assert_allclose(
            np.asarray(ms1(img)), np.asarray(base(img)), atol=1e-6
        )
        ms = segmentation.multi_scale(base, [0.5, 1.0])
        probs = np.asarray(ms(img))
        assert probs.shape == (40, 40, 4)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)

    def test_loader_kwargs_compose(self):
        predict = segmentation.load_predictor(
            classes=3, input_hw=(32, 32), widths=(8, 16),
            sliding=(32, 32), multi_scale=[0.75, 1.0],
        )
        img = np.random.default_rng(3).integers(
            0, 256, (64, 48, 3)).astype(np.uint8)
        probs = np.asarray(predict(img))
        assert probs.shape == (64, 48, 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)
        # grayscale input still normalized before windowing
        assert np.asarray(
            predict(np.zeros((64, 48), np.uint8))
        ).shape == (64, 48, 3)

    def test_rgbd_loader_sliding(self):
        predict = segmentation.load_rgbd_predictor(
            classes=5, input_hw=(32, 32), widths=(8, 16, 32),
            sliding=(32, 32),
        )
        rng = np.random.default_rng(4)
        color = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        depth = rng.integers(0, 5000, (24, 32)).astype(np.uint16)
        probs = np.asarray(predict(color, depth))
        assert probs.shape == (48, 64, 5)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)

    def test_sliding_beats_single_pass_on_fine_detail(self):
        """The parity point of sliding inference (ref demo predicts
        2048x1024 images through a 713x713 window): a model trained at
        its native input size loses fine structure when a large image is
        squeezed through one resized pass, and recovers it when windows
        run at native resolution. Train a tiny 2-class net to label fine
        checkerboard vs flat at 32x32, then evaluate a 128x128 composite."""
        import jax.numpy as jnp

        from semantic_meshes.models import training

        rng = np.random.default_rng(5)

        def make_tile(flat):
            if flat:
                img = np.full((32, 32, 3), 160, np.float32)
                lab = np.zeros((32, 32), np.int32)
            else:
                yy, xx = np.mgrid[:32, :32]
                img = np.where(
                    ((yy + xx) % 2)[..., None] == 0, 220.0, 90.0
                ).astype(np.float32) * np.ones((1, 1, 3), np.float32)
                lab = np.ones((32, 32), np.int32)
            img = img + rng.normal(0, 4, img.shape).astype(np.float32)
            return img, lab

        trainer = training.SegmentationTrainer(
            classes=2, input_hw=(32, 32), widths=(8, 16),
            learning_rate=3e-3,
        )
        for _ in range(60):
            tiles = [make_tile(bool(rng.integers(0, 2))) for _ in range(8)]
            trainer.train_step({
                "image": jnp.asarray(np.stack([t[0] for t in tiles])) / 255.0,
                "labels": jnp.asarray(np.stack([t[1] for t in tiles])),
            })

        # 128x128 composite: checkerboard quadrant in a flat field
        big = np.full((128, 128, 3), 160, np.float32)
        lab = np.zeros((128, 128), np.int32)
        yy, xx = np.mgrid[:64, :64]
        big[32:96, 32:96] = np.where(
            ((yy + xx) % 2)[..., None] == 0, 220.0, 90.0
        )
        lab[32:96, 32:96] = 1
        big = np.clip(
            big + rng.normal(0, 4, big.shape), 0, 255
        ).astype(np.uint8)

        def accuracy(predict):
            pred = np.asarray(predict(big)).argmax(-1)
            return (pred == lab).mean()

        single = segmentation.load_predictor(
            classes=2, input_hw=(32, 32), widths=(8, 16),
            params=trainer.params,
        )
        slid = segmentation.sliding(single, (32, 32), overlap=0.0)
        acc_single = accuracy(single)
        acc_sliding = accuracy(slid)
        # single-pass squeezes 128->32 (checker aliases away); sliding
        # sees native 32x32 tiles it was trained on
        assert acc_sliding > acc_single + 0.1, (acc_sliding, acc_single)
        assert acc_sliding > 0.9


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


class TestPredictorInputHandling:
    """Review-fix coverage: the batch fast path must accept every image
    shape the per-image predictor does, the sliding stride must honor the
    requested overlap, and params/params_path are mutually exclusive."""

    def test_batch_accepts_gray_and_rgba(self):
        predict = segmentation.load_predictor(
            classes=4, input_hw=(32, 32), widths=(8, 16)
        )
        gray = np.zeros((2, 40, 40), np.uint8)
        assert np.asarray(predict.batch(gray)).shape == (2, 40, 40, 4)
        rgba = np.zeros((2, 40, 40, 4), np.uint8)
        assert np.asarray(predict.batch(rgba)).shape == (2, 40, 40, 4)
        chan1 = np.zeros((2, 40, 40, 1), np.uint8)
        assert np.asarray(predict.batch(chan1)).shape == (2, 40, 40, 4)

    def test_sliding_gray_input_through_batch_path(self):
        # sliding() feeds raw window crops straight to .batch — a gray
        # input must survive the fast path end to end
        predict = segmentation.load_predictor(
            classes=3, input_hw=(32, 32), widths=(8, 16)
        )
        slid = segmentation.sliding(predict, (32, 32), overlap=0.25)
        img = np.random.default_rng(6).integers(
            0, 256, (64, 80)).astype(np.uint8)
        probs = np.asarray(slid(img))
        assert probs.shape == (64, 80, 3)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)

    def test_window_stride_honors_overlap(self):
        # floor(win * (1 - overlap)) guarantees actual overlap >= request
        for size, win, overlap in [(100, 40, 0.2), (97, 33, 0.33),
                                   (512, 100, 0.15), (64, 63, 0.5)]:
            starts = segmentation._window_starts(size, win, overlap)
            assert starts[0] == 0 and starts[-1] == size - win
            for a, b in zip(starts, starts[1:]):
                got = (win - (b - a)) / win
                assert got >= overlap - 1e-9, (size, win, overlap, a, b)

    def test_params_and_params_path_exclusive(self, tmp_path):
        p = tmp_path / "params.msgpack"
        p.write_bytes(b"")
        dummy = {"w": np.zeros(3)}
        with pytest.raises(ValueError, match="not both"):
            segmentation.load_predictor(
                classes=3, input_hw=(32, 32), widths=(8, 16),
                params=dummy, params_path=str(p),
            )
        with pytest.raises(ValueError, match="not both"):
            segmentation.load_rgbd_predictor(
                classes=3, input_hw=(32, 32), widths=(8, 16),
                params=dummy, params_path=str(p),
            )


def test_prepare_budgets_whole_camera_set():
    """renderer.prepare(cameras) sizes the dense candidate budget over the
    FULL camera set upfront: per-frame renders then never breach the
    budget (overflow_total 0, no mid-loop re-probe/recompile) and output
    is bit-identical to the unprepared sequential path."""
    import semantic_meshes
    from semantic_meshes import testing
    from semantic_meshes.io.ply import write_mesh
    import tempfile, os

    vertices, faces = testing.make_cube(4)
    d = tempfile.mkdtemp()
    write_mesh(os.path.join(d, "c.ply"), vertices, faces)
    mesh = semantic_meshes.data.Ply(os.path.join(d, "c.ply"))
    cams = testing.make_ring_cameras(num_views=4, width=128, height=96)
    # force the dense backend — prepare targets its adaptive budgets
    r_prep = semantic_meshes.render.triangles(mesh, backend="dense")
    r_prep.prepare(cams)
    key = (96, 128)
    assert key in r_prep.dense_cap_policy._cap
    budget = r_prep.dense_cap_policy._cap[key]

    r_seq = semantic_meshes.render.triangles(mesh, backend="dense")
    for cam in cams:
        idx_p, dep_p = r_prep.render(cam)
        idx_s, dep_s = r_seq.render(cam)
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_s))
        np.testing.assert_array_equal(np.asarray(dep_p), np.asarray(dep_s))
    # the whole-set budget never breaches and never regrows mid-loop
    assert r_prep.overflow_total() == 0
    assert r_prep.dense_cap_policy._cap[key] == budget
    # batch-max budget covers every single-camera probe
    per_cam = [
        semantic_meshes.render.triangles(mesh, backend="dense")
        for _ in cams
    ]
    for rc, cam in zip(per_cam, cams):
        rc.render(cam)
        single = rc.dense_cap_policy._cap[key]
        assert budget[0] >= single[0] and budget[1] >= single[1]


def test_prepare_groups_mixed_resolutions():
    import semantic_meshes
    from semantic_meshes import testing
    from semantic_meshes.io.ply import write_mesh
    import tempfile, os

    vertices, faces = testing.make_cube(3)
    d = tempfile.mkdtemp()
    write_mesh(os.path.join(d, "c.ply"), vertices, faces)
    mesh = semantic_meshes.data.Ply(os.path.join(d, "c.ply"))
    cams_a = testing.make_ring_cameras(num_views=2, width=128, height=96)
    cams_b = testing.make_ring_cameras(num_views=2, width=64, height=48)
    r = semantic_meshes.render.triangles(mesh, backend="dense")
    r.prepare(cams_a + cams_b)
    assert (96, 128) in r.dense_cap_policy._cap
    assert (48, 64) in r.dense_cap_policy._cap
    for cam in cams_a + cams_b:
        r.render(cam)
    assert r.overflow_total() == 0
