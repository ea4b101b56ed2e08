import numpy as np
import pytest

from semantic_meshes import ops


def _oracle(data, idx, P):
    out = np.zeros((P,) + data.shape[1:], np.float64)
    for i, d in zip(idx, data):
        if 0 <= i < P:
            out[i] += d
    return out


@pytest.mark.parametrize("P", [7, 129, 2048])
def test_mxu_path_matches_oracle(P):
    rng = np.random.default_rng(0)
    N, D = 5000, 6
    data = rng.normal(size=(N, D)).astype(np.float32)
    idx = rng.integers(-3, P + 5, size=N).astype(np.int32)  # incl. OOB
    got = np.asarray(ops.segment_sum(data, idx, P))
    np.testing.assert_allclose(got, _oracle(data, idx, P), rtol=1e-5,
                               atol=1e-4)


def test_scatter_path_matches_oracle():
    import os

    P = ops.SEGMENT_MXU_MAX_P + 10  # force the scatter fallback
    rng = np.random.default_rng(1)
    N, D = 3000, 4
    data = rng.normal(size=(N, D)).astype(np.float32)
    idx = rng.integers(-2, P + 3, size=N).astype(np.int64)
    got = np.asarray(ops.segment_sum(data, idx, P))
    # the opt-in bf16 scatter mode trades exactness for the fast path
    loose = os.environ.get("SM_SCATTER_DTYPE") == "bfloat16"
    np.testing.assert_allclose(
        got, _oracle(data, idx, P),
        rtol=2e-2 if loose else 1e-5, atol=2e-2 if loose else 1e-4,
    )


def test_both_paths_agree():
    rng = np.random.default_rng(2)
    N, D, P = 4096, 3, 512
    data = rng.normal(size=(N, D)).astype(np.float32)
    idx = rng.integers(0, P, size=N).astype(np.int32)
    mxu = np.asarray(ops._segment_sum_mxu(data, idx, P))
    import jax

    sc = np.asarray(jax.ops.segment_sum(data, idx, num_segments=P))
    np.testing.assert_allclose(mxu, sc, rtol=1e-5, atol=1e-4)


def test_rank1_data():
    rng = np.random.default_rng(3)
    data = rng.normal(size=500).astype(np.float32)
    idx = rng.integers(0, 17, size=500).astype(np.int32)
    got = np.asarray(ops.segment_sum(data, idx, 17))
    assert got.shape == (17,)
    np.testing.assert_allclose(
        got, _oracle(data[:, None], idx, 17)[:, 0], rtol=1e-5, atol=1e-4
    )
