import numpy as np
import pytest

from semantic_meshes import fusion


def oracle(P, C, agg, iew, adds):
    """Direct numpy transcription of the reference fusion semantics
    (ref: include/semantic_meshes/fusion/Mesh.h:66-107 weight/skip logic,
    python/semantic_meshes/src/Fusion.cu:46-92 aggregator math)."""
    if agg == "mul":
        acc = np.zeros((P, C), np.float64)  # log space, identity log(1)=0
    else:
        acc = np.zeros((P, C), np.float64)
    for prim, probs, weights in adds:
        prim = np.asarray(prim)
        probs = np.asarray(probs, np.float64)
        weights = (
            np.ones(prim.shape) if weights is None else np.asarray(weights)
        )
        counts = {}
        for idx in prim.reshape(-1):
            counts[idx] = counts.get(idx, 0) + 1
        for pos in np.ndindex(prim.shape):
            idx = prim[pos]
            if not (0 <= idx < P):
                continue
            p = probs[pos]
            if p.sum() <= 0.5:
                continue
            image_weight = 1.0 / counts[idx]
            w = (iew * image_weight + (1 - iew) * 1.0) * weights[pos]
            if agg == "sum":
                acc[idx] += p * w
            elif agg == "summax":
                out = np.zeros(C)
                m = np.argmax(p)
                out[m] = p[m]
                acc[idx] += out * w
            elif agg == "mul":
                with np.errstate(divide="ignore"):
                    acc[idx] += w * np.log(p)
    # get(): postchain
    if agg == "mul":
        m = acc.max(axis=-1, keepdims=True)
        probs = np.exp(acc - m)
    else:
        probs = acc
    with np.errstate(invalid="ignore", divide="ignore"):
        probs = probs / probs.sum(-1, keepdims=True)
    probs[~np.isfinite(probs)] = 0
    return probs


def rand_inputs(rng, P, C, hw=(6, 7), dontcare_frac=0.2, oob_frac=0.1):
    h, w = hw
    prim = rng.integers(0, P, size=(h, w)).astype(np.int64)
    # some out-of-range ids incl. the uint32 background sentinel
    oob = rng.random((h, w)) < oob_frac
    prim[oob] = P + 5
    probs = rng.random((h, w, C)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    dc = rng.random((h, w)) < dontcare_frac
    probs[dc] = 0.0
    weights = rng.random((h, w)).astype(np.float32) + 0.1
    return prim, probs, weights


@pytest.mark.parametrize("agg", ["sum", "summax", "mul"])
@pytest.mark.parametrize("iew", [0.0, 0.5, 1.0])
def test_matches_oracle(agg, iew):
    rng = np.random.default_rng(42)
    P, C = 11, 5
    adds = [rand_inputs(rng, P, C) for _ in range(3)]
    ma = fusion.MeshAggregator(P, C, aggregator=agg, images_equal_weight=iew)
    for prim, probs, weights in adds:
        ma.add(prim, probs, weights)
    got = np.asarray(ma.get())
    want = oracle(P, C, agg, iew, adds)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("agg", ["sum", "summax", "mul"])
def test_default_weights(agg):
    rng = np.random.default_rng(1)
    P, C = 7, 4
    prim, probs, _ = rand_inputs(rng, P, C)
    ma = fusion.MeshAggregator(P, C, aggregator=agg)
    ma.add(prim, probs)
    want = oracle(P, C, agg, 0.5, [(prim, probs, None)])
    np.testing.assert_allclose(np.asarray(ma.get()), want, atol=1e-4)


def test_uint32_background_sentinel():
    P, C = 4, 3
    prim = np.full((2, 2), 0xFFFFFFFF, np.uint32)
    prim[0, 0] = 1
    probs = np.zeros((2, 2, C), np.float32)
    probs[..., 0] = 1.0
    ma = fusion.MeshAggregator(P, C, aggregator="sum")
    ma.add(prim, probs)
    got = np.asarray(ma.get())
    assert got[1, 0] == 1.0
    np.testing.assert_array_equal(got[[0, 2, 3]], 0.0)


def test_untouched_primitives():
    # sum/summax: zeros; mul: uniform (product identity), matching the
    # reference's LogProb arithmetic
    P, C = 3, 4
    for agg, expect in [("sum", 0.0), ("summax", 0.0), ("mul", 1.0 / C)]:
        ma = fusion.MeshAggregator(P, C, aggregator=agg)
        got = np.asarray(ma.get())
        np.testing.assert_allclose(got, expect, atol=1e-6)


def test_reset_and_state_roundtrip():
    rng = np.random.default_rng(2)
    P, C = 5, 3
    prim, probs, weights = rand_inputs(rng, P, C)
    ma = fusion.MeshAggregator(P, C)
    ma.add(prim, probs, weights)
    state = np.asarray(ma.state).copy()
    assert state.any()
    ma.reset()
    assert not np.asarray(ma.state).any()
    ma.state = state
    np.testing.assert_allclose(np.asarray(ma.state), state)


def test_merge_equals_sequential():
    """Sharded fusion invariant: adding views on two aggregators then merging
    == adding all views on one (the multi-chip merge operator)."""
    rng = np.random.default_rng(3)
    P, C = 9, 6
    adds = [rand_inputs(rng, P, C) for _ in range(4)]
    for agg in ["sum", "summax", "mul"]:
        ma_all = fusion.MeshAggregator(P, C, aggregator=agg)
        for a in adds:
            ma_all.add(*a)
        ma_a = fusion.MeshAggregator(P, C, aggregator=agg)
        ma_b = fusion.MeshAggregator(P, C, aggregator=agg)
        for a in adds[:2]:
            ma_a.add(*a)
        for a in adds[2:]:
            ma_b.add(*a)
        ma_a.merge(ma_b.state)
        np.testing.assert_allclose(
            np.asarray(ma_a.get()), np.asarray(ma_all.get()), atol=1e-5
        )


def test_dimension_mismatch_raises():
    ma = fusion.MeshAggregator(4, 3)
    with pytest.raises(ValueError, match="same width and height"):
        ma.add(np.zeros((2, 2), np.int32), np.zeros((3, 2, 3), np.float32))
    with pytest.raises(ValueError, match="same width and height"):
        ma.add(
            np.zeros((2, 2), np.int32),
            np.zeros((2, 2, 3), np.float32),
            np.zeros((2, 3), np.float32),
        )
    with pytest.raises(ValueError, match="classes"):
        ma.add(np.zeros((2, 2), np.int32), np.zeros((2, 2, 5), np.float32))


def test_unknown_aggregator_raises():
    with pytest.raises(ValueError, match="unknown aggregator"):
        fusion.MeshAggregator(4, 3, aggregator="median")


def test_case_insensitive_aggregator():
    ma = fusion.MeshAggregator(4, 3, aggregator="Sum")
    assert ma.aggregator == "sum"


def test_model_renderer_gather():
    P, C = 4, 3
    ma = fusion.MeshAggregator(P, C, aggregator="sum")
    prim = np.array([[0, 1], [2, 0xFFFFFFFF & 0x7FFFFFFF]], np.int64)
    prim[1, 1] = 999  # out of range
    probs = np.eye(3)[np.array([[0, 1], [2, 0]])].astype(np.float32)
    ma.add(prim, probs)
    r = ma.renderer()
    img = np.asarray(r.render(prim, background=0.0))
    np.testing.assert_allclose(img[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(img[0, 1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(img[1, 1], 0.0)
    img2 = np.asarray(r.render(prim, background=np.full(C, 0.25)))
    np.testing.assert_allclose(img2[1, 1], 0.25)


def test_mul_log_space_stability():
    """Long products must not underflow: 200 views of the same pixel."""
    P, C = 2, 3
    ma = fusion.MeshAggregator(P, C, aggregator="mul")
    probs = np.array([[[0.7, 0.2, 0.1]]], np.float32)
    prim = np.zeros((1, 1), np.int64)
    for _ in range(200):
        ma.add(prim, probs)
    got = np.asarray(ma.get())
    # overwhelming evidence for class 0
    assert got[0, 0] > 0.999
    assert np.isfinite(got).all()


def test_mul_zero_prob_component():
    P, C = 1, 3
    ma = fusion.MeshAggregator(P, C, aggregator="mul")
    ma.add(np.zeros((1, 1), np.int64),
           np.array([[[0.0, 0.6, 0.4]]], np.float32))
    got = np.asarray(ma.get())
    assert got[0, 0] < 1e-6
    np.testing.assert_allclose(got[0].sum(), 1.0, atol=1e-5)


@pytest.mark.parametrize("agg", ["sum", "summax", "mul"])
def test_large_p_exact16_matches_oracle(agg, monkeypatch):
    """P above the f32 scatter's P-cliff routes through the exact16 limb
    scatter (mul via the near/far-field split); results must still match
    the reference-semantics oracle, including zero-prob components and
    don't-care pixels. The cliff is lowered so the test P (unique per
    aggregator — jit caches key on P) exercises the limb path."""
    from semantic_meshes import ops

    monkeypatch.setattr(ops, "_F32_FAST_MAX_P", ops.SEGMENT_MXU_MAX_P)
    rng = np.random.default_rng(77)
    P = ops.SEGMENT_MXU_MAX_P + 50 + 7 * len(agg)  # unique per param
    C = 5
    assert ops.effective_method(P) == "exact16"
    prim, probs, weights = rand_inputs(rng, P, C, hw=(40, 50))
    # a few exact-zero components (log -> _NEG_LARGE; exercises the
    # mul far-field tail channel)
    zero_mask = rng.random(probs.shape) < 0.01
    probs[zero_mask] = 0.0
    ma = fusion.MeshAggregator(P, C, aggregator=agg)
    ma.add(prim, probs, weights)
    got = np.asarray(ma.get())
    want = oracle(P, C, agg, 0.5, [(prim, probs, weights)])
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_mul_exact16_small_weights_annihilate(monkeypatch):
    """A zero-probability component must drive its class to 0 even under
    a tiny pixel weight — the far-field tail channel must not lose the
    annihilating magnitude to quantization."""
    from semantic_meshes import ops

    monkeypatch.setattr(ops, "_F32_FAST_MAX_P", ops.SEGMENT_MXU_MAX_P)
    P = ops.SEGMENT_MXU_MAX_P + 93  # unique P: jit caches key on shapes
    C = 3
    prim = np.zeros((4, 4), np.int64)
    probs = np.full((4, 4, C), 1.0 / C, np.float32)
    probs[0, 0, 1] = 0.0  # class 1 impossible in one pixel
    weights = np.full((4, 4), 1e-3, np.float32)
    ma = fusion.MeshAggregator(P, C, aggregator="mul")
    ma.add(prim, probs, weights)
    got = np.asarray(ma.get())[0]
    assert got[1] == 0.0
    np.testing.assert_allclose(got[[0, 2]], 0.5, atol=1e-5)


def test_add_many_matches_sequential():
    rng = np.random.default_rng(13)
    P, C = 9, 4
    adds = [rand_inputs(rng, P, C) for _ in range(3)]
    seq = fusion.MeshAggregator(P, C, aggregator="sum")
    for prim, probs, weights in adds:
        seq.add(prim, probs, weights)
    batched = fusion.MeshAggregator(P, C, aggregator="sum")
    batched.add_many(
        np.stack([a[0] for a in adds]),
        np.stack([a[1] for a in adds]),
        np.stack([a[2] for a in adds]),
    )
    np.testing.assert_allclose(
        np.asarray(batched.state), np.asarray(seq.state), rtol=1e-6,
        atol=1e-6,
    )
    # no-weights variant
    seq2 = fusion.MeshAggregator(P, C, aggregator="mul")
    b2 = fusion.MeshAggregator(P, C, aggregator="mul")
    for prim, probs, _ in adds:
        seq2.add(prim, probs)
    b2.add_many(np.stack([a[0] for a in adds]),
                np.stack([a[1] for a in adds]))
    np.testing.assert_allclose(
        np.asarray(b2.state), np.asarray(seq2.state), rtol=1e-6, atol=1e-6
    )


def test_add_many_shape_errors():
    ma = fusion.MeshAggregator(4, 3)
    with pytest.raises(ValueError, match="add_many expects"):
        ma.add_many(np.zeros((2, 2), np.int32),
                    np.zeros((2, 2, 3), np.float32))
    with pytest.raises(ValueError, match="classes"):
        ma.add_many(np.zeros((1, 2, 2), np.int32),
                    np.zeros((1, 2, 2, 5), np.float32))


def test_bfloat16_probs_input():
    """bf16 probability inputs promote to f32 accumulation (half the HBM
    traffic for the biggest input of the batched pipelines)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    P, C = 8, 4
    prim, probs, weights = rand_inputs(rng, P, C)
    ma32 = fusion.MeshAggregator(P, C)
    ma32.add(prim, probs, weights)
    ma16 = fusion.MeshAggregator(P, C)
    ma16.add(prim, jnp.asarray(probs, jnp.bfloat16), weights)
    assert np.asarray(ma16.state).dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(ma16.get()), np.asarray(ma32.get()), atol=2e-2
    )
