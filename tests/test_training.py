import numpy as np
import pytest

pytest.importorskip("optax")
pytest.importorskip("flax")

from semantic_meshes.models.training import (  # noqa: E402
    SegmentationTrainer,
    make_data_parallel_step,
    softmax_xent_ignore,
)


def _toy_batch(rng, B, H, W, C, with_depth=False):
    # learnable toy task: label = 1 where the red channel is bright
    image = rng.random((B, H, W, 3)).astype(np.float32)
    labels = (image[..., 0] > 0.5).astype(np.int32)
    labels[:, 0, 0] = -1  # some ignore pixels
    batch = {"image": image, "labels": labels}
    if with_depth:
        batch["depth"] = rng.random((B, H, W, 1)).astype(np.float32)
    return batch


def test_xent_ignore():
    import jax.numpy as jnp

    logits = jnp.asarray([[10.0, -10.0], [10.0, -10.0]])[None, None]
    labels = jnp.asarray([[0, -1]])[None]
    # only the first pixel counts; it is correct -> near-zero loss
    loss = float(softmax_xent_ignore(logits, labels))
    assert loss < 1e-3


def test_loss_decreases():
    rng = np.random.default_rng(0)
    tr = SegmentationTrainer(classes=2, input_hw=(32, 32),
                             widths=(8, 16, 32), learning_rate=3e-3)
    batch = _toy_batch(rng, 4, 32, 32, 2)
    first = tr.train_step(batch)
    for _ in range(15):
        last = tr.train_step(batch)
    assert last < first * 0.7, (first, last)


def test_rgbd_trainer_steps():
    rng = np.random.default_rng(1)
    tr = SegmentationTrainer(classes=3, input_hw=(32, 32),
                             widths=(8, 16, 32), arch="rgbd")
    batch = _toy_batch(rng, 2, 32, 32, 3, with_depth=True)
    loss = tr.train_step(batch)
    assert np.isfinite(loss)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    tr = SegmentationTrainer(classes=2, input_hw=(32, 32), widths=(8, 16, 32))
    tr.train_step(_toy_batch(rng, 2, 32, 32, 2))
    tr.save(tmp_path / "params.msgpack")
    tr2 = SegmentationTrainer(classes=2, input_hw=(32, 32),
                              widths=(8, 16, 32))
    tr2.load(tmp_path / "params.msgpack")
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_matches_single_chip():
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if devices.size < 4:
        pytest.skip("needs multiple devices")
    mesh = Mesh(devices[:4].reshape(4, 1), ("views", "pixels"))

    rng = np.random.default_rng(3)
    tr_a = SegmentationTrainer(classes=2, input_hw=(16, 16), widths=(8, 16))
    tr_b = SegmentationTrainer(classes=2, input_hw=(16, 16), widths=(8, 16))
    batch = _toy_batch(rng, 8, 16, 16, 2)

    # single chip
    pa, oa, loss_a = tr_a._step(tr_a.params, tr_a.opt_state, batch)

    # data parallel over 4 devices
    step = make_data_parallel_step(tr_b, mesh)
    with mesh:
        pb, ob, loss_b = step(tr_b.params, tr_b.opt_state, batch)

    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-5)
    # bf16 convs reduce in different orders per batch split, and AdamW
    # normalizes the (tiny) gradients, so per-parameter agreement is only
    # to the scale of one update step (lr = 3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3
        )
