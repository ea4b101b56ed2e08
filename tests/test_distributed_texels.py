"""Batched texel-mode fusion must match the sequential public API, and
checkpoint round trips must preserve fusion state exactly."""

import numpy as np
import pytest

import semantic_meshes
from semantic_meshes import checkpoint, distributed, testing
from semantic_meshes.data import stack_cameras
from semantic_meshes.io.ply import write_mesh


@pytest.fixture(scope="module")
def texel_scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("texels")
    vertices, faces = testing.make_cube(subdivisions=3)
    write_mesh(tmp / "cube.ply", vertices, faces)
    mesh = semantic_meshes.data.Ply(str(tmp / "cube.ply"))
    cams = testing.make_ring_cameras(num_views=3, width=128, height=96)
    renderer = semantic_meshes.render.texels(mesh, cams, 1.5)
    return mesh, cams, renderer


def test_fuse_views_texels_matches_sequential(texel_scene):
    mesh, cams, renderer = texel_scene
    P = renderer.getPrimitivesNum()
    C = 4
    rng = np.random.default_rng(11)
    W, H = cams[0].resolution
    probs = np.stack([testing.random_probs(rng, H, W, C) for _ in cams])

    agg = semantic_meshes.fusion.MeshAggregator(
        primitives=P, classes=C, aggregator="sum"
    )
    for cam, pr in zip(cams, probs):
        idx, _ = renderer.render(cam)
        agg.add(idx, pr.transpose(1, 0, 2))

    rot, trans, fl, pp = stack_cameras(cams)
    acc, overflow = distributed.fuse_views_texels(
        renderer.vertices, renderer.faces, renderer.resolutions,
        renderer.first_texel_index, rot, trans, fl, pp, probs,
        np.float32(0.5),
        num_primitives=P, aggregator="sum", height=H, width=W,
    )
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(acc), np.asarray(agg.state), rtol=2e-5, atol=1e-5
    )


def test_checkpoint_roundtrip(tmp_path, texel_scene):
    mesh, cams, renderer = texel_scene
    P = renderer.getPrimitivesNum()
    C = 4
    rng = np.random.default_rng(5)
    W, H = cams[0].resolution

    agg = semantic_meshes.fusion.MeshAggregator(
        primitives=P, classes=C, aggregator="mul", images_equal_weight=0.7
    )
    idx, _ = renderer.render(cams[0])
    agg.add(idx, testing.random_probs(rng, H, W, C).transpose(1, 0, 2))

    path = tmp_path / "ckpt.npz"
    checkpoint.save_aggregator(path, agg, views_done=1,
                               extra={"scene": "cube"})
    agg2, views_done, extra = checkpoint.load_aggregator(path)
    assert views_done == 1
    assert extra == {"scene": "cube"}
    assert agg2.aggregator == "mul"
    assert agg2.images_equal_weight == 0.7
    np.testing.assert_array_equal(np.asarray(agg2.state), np.asarray(agg.state))

    # resuming: one more view on both gives identical results
    pr = testing.random_probs(rng, H, W, C)
    idx1, _ = renderer.render(cams[1])
    agg.add(idx1, pr.transpose(1, 0, 2))
    agg2.add(idx1, pr.transpose(1, 0, 2))
    np.testing.assert_allclose(
        np.asarray(agg2.get()), np.asarray(agg.get()), atol=1e-6
    )


def test_profiling_phase_timers():
    from semantic_meshes.profiling import PhaseTimers

    t = PhaseTimers()
    with t.phase("alpha"):
        pass
    with t.phase("alpha"):
        pass
    with t.phase("beta"):
        pass
    assert t.counts["alpha"] == 2
    assert t.counts["beta"] == 1
    rep = t.report()
    assert "alpha" in rep and "beta" in rep
    # median is compile-free steady state: odd/even counts + missing phase
    t.durations["gamma"] = [5.0, 0.01, 0.02]
    assert t.median("gamma") == 0.02
    t.durations["delta"] = [0.01, 0.03, 5.0, 5.0]
    assert abs(t.median("delta") - 2.515) < 1e-9
    assert t.median("never-ran") == 0.0
    assert "ms median" in rep


def test_sharded_texels_matches_single_chip(texel_scene):
    import jax
    import pytest as _pytest
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if devices.size < 8:
        _pytest.skip("needs 8 devices (virtual cpu mesh)")
    mesh_dev = Mesh(devices[:8].reshape(2, 4), ("views", "pixels"))

    mesh, cams, renderer = texel_scene
    P = renderer.getPrimitivesNum()
    C = 3
    rng = np.random.default_rng(9)
    W, H = cams[0].resolution
    # 2 views to match the 'views' axis
    use_cams = cams[:2]
    probs = np.stack([testing.random_probs(rng, H, W, C) for _ in use_cams])
    rot, trans, fl, pp = stack_cameras(use_cams)

    ref = np.asarray(
        distributed.fuse_views_texels(
            renderer.vertices, renderer.faces, renderer.resolutions,
            renderer.first_texel_index, rot, trans, fl, pp, probs,
            np.float32(0.5),
            num_primitives=P, aggregator="sum", height=H, width=W,
        )[0]
    )
    fuse = distributed.make_sharded_fuse(
        mesh_dev, num_primitives=P, aggregator="sum", height=H, width=W,
        texel_params=(renderer.resolutions, renderer.first_texel_index),
    )
    with mesh_dev:
        got, overflow = fuse(
            renderer.vertices, renderer.faces, rot, trans, fl, pp,
            probs, np.float32(0.5)
        )
        got = np.asarray(got)
    assert int(overflow) == 0
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_checkpoint_extensionless_path(tmp_path, texel_scene):
    from semantic_meshes import checkpoint
    import semantic_meshes

    agg = semantic_meshes.fusion.MeshAggregator(4, 3)
    path = tmp_path / "ckpt"  # no .npz extension
    checkpoint.save_aggregator(str(path), agg)
    agg2, _, _ = checkpoint.load_aggregator(str(path))
    assert agg2.primitives == 4


def test_state_reference_survives_add(texel_scene):
    """Holding .state across add() must stay valid (no buffer donation)."""
    import semantic_meshes
    from semantic_meshes import testing as sm_testing

    mesh, cams, renderer = texel_scene
    P = renderer.getPrimitivesNum()
    agg = semantic_meshes.fusion.MeshAggregator(P, 3)
    old_state = agg.state
    rng = np.random.default_rng(0)
    W, H = cams[0].resolution
    idx, _ = renderer.render(cams[0])
    agg.add(idx, sm_testing.random_probs(rng, H, W, 3).transpose(1, 0, 2))
    # old snapshot still readable and all zeros
    assert float(np.asarray(old_state).sum()) == 0.0


class TestCheckpointRobustness:
    """Corrupt/incompatible checkpoints must raise CheckpointError (a
    ValueError), never np.load's raw failure zoo (BadZipFile / EOFError /
    KeyError / JSONDecodeError) — same typed-error contract as the IO
    codecs (tests/test_io.py fuzz classes)."""

    def _good(self, tmp_path):
        from semantic_meshes import checkpoint, fusion

        agg = fusion.MeshAggregator(7, 3, aggregator="sum")
        p = tmp_path / "ckpt.npz"
        checkpoint.save_aggregator(str(p), agg, views_done=2)
        return p

    def test_corrupt_bytes_raise_typed(self, tmp_path):
        from semantic_meshes import checkpoint

        p = self._good(tmp_path)
        seed = p.read_bytes()
        rng = np.random.default_rng(0)
        cases = [
            b"",                              # empty
            b"not a checkpoint",              # not a zip
            seed[: len(seed) // 2],           # truncated
        ]
        for _ in range(40):                   # random byte flips
            data = bytearray(seed)
            for _ in range(int(rng.integers(1, 12))):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            cases.append(bytes(data))
        bad = tmp_path / "bad.npz"
        for i, data in enumerate(cases):
            bad.write_bytes(data)
            try:
                checkpoint.load_aggregator(str(bad))
            except checkpoint.CheckpointError:
                pass
            except Exception as e:  # noqa: BLE001 - the assertion target
                raise AssertionError(
                    f"case {i}: leaked {type(e).__name__}: {e}"
                ) from e

    def test_shape_contradiction_raises(self, tmp_path):
        import json

        from semantic_meshes import checkpoint, fusion

        agg = fusion.MeshAggregator(7, 3, aggregator="sum")
        meta = dict(
            format_version=1, primitives=9, classes=3,  # lies: P=9, not 7
            aggregator="sum", images_equal_weight=0.5,
            views_done=0, extra={},
        )
        p = tmp_path / "lying.npz"
        with open(p, "wb") as f:
            np.savez_compressed(
                f, state=np.asarray(agg.state),
                meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
            )
        with pytest.raises(checkpoint.CheckpointError, match="shape"):
            checkpoint.load_aggregator(str(p))

    def test_future_format_version_raises(self, tmp_path):
        import json

        from semantic_meshes import checkpoint, fusion

        agg = fusion.MeshAggregator(7, 3, aggregator="sum")
        meta = dict(
            format_version=99, primitives=7, classes=3,
            aggregator="sum", images_equal_weight=0.5,
            views_done=0, extra={},
        )
        p = tmp_path / "future.npz"
        with open(p, "wb") as f:
            np.savez_compressed(
                f, state=np.asarray(agg.state),
                meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
            )
        with pytest.raises(checkpoint.CheckpointError, match="format"):
            checkpoint.load_aggregator(str(p))
