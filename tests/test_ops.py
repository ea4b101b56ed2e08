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


class TestExact16:
    """The exact16 limb scatter (ops._segment_sum_exact16): 16-bit fast
    path speed with f32-class accuracy. These tests exercise every leg of
    the correctness argument in its docstring."""

    def test_matches_oracle_random(self):
        rng = np.random.default_rng(10)
        N, D, P = 20_000, 5, 5000
        data = rng.normal(size=(N, D)).astype(np.float32) * 3.7
        idx = rng.integers(-2, P + 3, size=N).astype(np.int32)
        got = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        want = _oracle(data, idx, P)
        # error bound: quantization only, <= 0.5 * max|v| * 2^-23 per row
        atol = float(np.abs(data).max()) * 2.0**-23 * (N / P * 8 + 4)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)

    @pytest.mark.parametrize("bits", [2, 3, 4, 6, 8])
    def test_limb_width_ablation_configs(self, bits):
        """Every supported limb width (SM_EXACT16_BITS / the microbench
        ablation axis) satisfies the full correctness argument: random
        rows incl. out-of-range drops, plus a wrap-heavy segment beyond
        that width's cap that must be MXU-corrected."""
        import jax.numpy as jnp

        L, center, cap, groups = ops._exact16_config(bits)
        assert L * bits == 24
        assert sum(j1 - j0 for j0, j1 in groups) == L
        B = 1 << bits
        for j0, j1 in groups:
            assert (B ** (j1 - j0) - 1) * cap < (1 << 24)

        rng = np.random.default_rng(20 + bits)
        N, D, P = 30_000, 4, 2000
        data = rng.normal(size=(N, D)).astype(np.float32)
        idx = rng.integers(-1, P + 2, size=N).astype(np.int32)
        # overload one segment past this width's wrap capacity
        idx[: cap + 500] = 7
        valid = (idx >= 0) & (idx < P)
        masked = np.where(valid[:, None], data, 0.0)
        safe = np.where(valid, idx, P).astype(np.int32)
        got = np.asarray(ops._segment_sum_exact16(
            jnp.asarray(masked), jnp.asarray(safe), P, bits=bits
        ))
        want = _oracle(data, idx, P)
        atol = float(np.abs(data).max()) * 2.0**-23 * (N / P * 8 + 4)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)

    def test_heavy_segment_wrap_corrected(self):
        # one segment receives far more rows than the 16383-row limb
        # capacity: its int16 limb sums wrap, and the top-64 MXU pass must
        # restore the exact f32 answer.
        rng = np.random.default_rng(11)
        N, D, P = 40_000, 3, 4000
        data = rng.random((N, D)).astype(np.float32)
        idx = np.where(
            rng.random(N) < 0.9, 7, rng.integers(0, P, size=N)
        ).astype(np.int32)  # ~36k rows on segment 7
        got = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        want = _oracle(data, idx, P)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)

    def test_count_aliasing_beyond_2_16(self):
        # a segment with > 65536 rows would alias a naive mod-2^16 count;
        # the chunk-count columns must still classify it as heavy and the
        # correction must restore exactness.
        rng = np.random.default_rng(12)
        N, D, P = 140_000, 2, 4000
        data = rng.random((N, D)).astype(np.float32)
        idx = np.where(
            rng.random(N) < 0.5, 3, rng.integers(0, P, size=N)
        ).astype(np.int32)  # ~70k rows on segment 3 (70k mod 2^16 = 4.5k)
        got = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        want = _oracle(data, idx, P)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)

    def test_negative_and_large_scale(self):
        rng = np.random.default_rng(13)
        N, D, P = 8000, 4, 4000
        data = (rng.normal(size=(N, D)) * 1e6).astype(np.float32)
        idx = rng.integers(0, P, size=N).astype(np.int32)
        got = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        want = _oracle(data, idx, P)
        atol = float(np.abs(data).max()) * 2.0**-23 * 64
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)

    def test_all_zero(self):
        idx = np.arange(100, dtype=np.int32) % 4000
        data = np.zeros((100, 3), np.float32)
        got = np.asarray(ops.segment_sum(data, idx, 4000, method="exact16"))
        assert np.all(got == 0)

    def test_single_huge_segment_all_rows(self):
        # every row lands on one segment (the render-background pattern)
        rng = np.random.default_rng(14)
        N, P = 100_000, 4000
        data = rng.random((N, 2)).astype(np.float32)
        idx = np.zeros(N, np.int32)
        got = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        want = _oracle(data, idx, P)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)

    def test_more_than_64_heavy_segments(self):
        """A view larger than 64 * 16384 rows can contain more than 64
        over-capacity segments; the correction's k must scale with the
        row count or some wrapped segments would ship silently."""
        rng = np.random.default_rng(16)
        heavy = 70
        per = 16_500  # > _EXACT16_CAP rows each
        N = heavy * per
        P = 4000
        idx = np.repeat(np.arange(heavy, dtype=np.int32), per)
        # values near -max so the centered limbs sit at -2 and per-segment
        # limb sums actually exceed +-2^15 (random data concentrates near
        # -0.5 * N and would not wrap, passing vacuously)
        data = -(0.9 + 0.1 * rng.random((N, 2))).astype(np.float32)
        got = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        want = np.zeros((P, 2))
        np.add.at(want, idx, data.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)

    def test_methods_agree(self):
        rng = np.random.default_rng(15)
        N, D, P = 9000, 3, 4000
        data = rng.random((N, D)).astype(np.float32)
        idx = rng.integers(0, P, size=N).astype(np.int32)
        a = np.asarray(ops.segment_sum(data, idx, P, method="exact16"))
        b = np.asarray(ops.segment_sum(data, idx, P, method="float32"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_rank1_data():
    rng = np.random.default_rng(3)
    data = rng.normal(size=500).astype(np.float32)
    idx = rng.integers(0, 17, size=500).astype(np.int32)
    got = np.asarray(ops.segment_sum(data, idx, 17))
    assert got.shape == (17,)
    np.testing.assert_allclose(
        got, _oracle(data[:, None], idx, 17)[:, 0], rtol=1e-5, atol=1e-4
    )
