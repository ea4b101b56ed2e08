"""Wire formats for precomputed probability maps (semantic_meshes.probs_io).

The reference uploads dense float maps straight from its GPU-resident
model (ref: eval-scannet/eval_scannet.py:217-225); our --probs legs read
maps from disk, so the wire format is a first-class knob. These tests pin
the quantization error bounds and the device-side densify against numpy
oracles, and the file-level load() contract both scripts rely on.
"""

import numpy as np
import pytest

from semantic_meshes import probs_io


def _softmax_maps(h=7, w=5, c=19, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, (h, w, c)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _topk_arrays(probs, k):
    part = np.argpartition(probs, -k, axis=-1)[..., -k:]
    vals = np.take_along_axis(probs, part, axis=-1)
    order = np.argsort(-vals, axis=-1)
    idx = np.take_along_axis(part, order, axis=-1).astype(np.uint8)
    return np.take_along_axis(vals, order, axis=-1), idx


class TestQuantize:
    def test_u8_roundtrip_error_bound(self):
        probs = _softmax_maps()
        q = probs_io.quantize_u8(probs)
        assert q.dtype == np.uint8
        back = q.astype(np.float32) / 255.0
        assert np.abs(back - probs).max() <= 0.5 / 255.0 + 1e-7

    def test_u8_saturates_at_one(self):
        assert probs_io.quantize_u8(np.array([1.0, 0.0]))[0] == 255


class TestDensify:
    def test_dense_f16_matches_f32(self):
        probs = _softmax_maps()
        out = np.asarray(probs_io.densify(probs.astype(np.float16)))
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, probs, atol=2 ** -11)

    def test_dense_u8_dequantizes(self):
        probs = _softmax_maps()
        out = np.asarray(probs_io.densify(probs_io.quantize_u8(probs)))
        np.testing.assert_allclose(out, probs, atol=1 / 510 + 1e-6)

    def test_topk_full_k_is_exact_to_quantization(self):
        """K = classes keeps everything: densify == dequantized dense."""
        probs = _softmax_maps(c=6)
        vals, idx = _topk_arrays(probs, 6)
        import jax

        t = probs_io.TopKProbs(
            jax.device_put(probs_io.quantize_u8(vals)),
            jax.device_put(idx), 6,
        )
        out = np.asarray(probs_io.densify(t))
        np.testing.assert_allclose(out, probs, atol=1 / 510 + 1e-6)

    def test_topk_drops_only_the_tail(self):
        """K < classes: kept classes match the original; dropped classes
        get the uniform residual floor (1-s)/(C-K) — NOT exact zero,
        which aggregator='mul' would turn into a permanent veto
        (ADVICE r4: a class outside the top-K in one view must not be
        -inf'd out of the whole fusion)."""
        probs = _softmax_maps()
        k = 4
        c = probs.shape[-1]
        vals, idx = _topk_arrays(probs, k)
        import jax

        t = probs_io.TopKProbs(
            jax.device_put(vals.astype(np.float16)),
            jax.device_put(idx), c,
        )
        out = np.asarray(probs_io.densify(t))
        oracle = np.zeros_like(probs)
        np.put_along_axis(oracle, idx.astype(np.int64), vals, axis=-1)
        s = oracle.sum(-1, keepdims=True)
        floor = np.maximum(1.0 - s, 0.0) / (c - k)
        oracle = np.where(s <= 0.5, oracle, np.maximum(oracle, floor))
        np.testing.assert_allclose(out, oracle, atol=2 ** -10)
        # every pixel's map still sums to ~1 (retained + spread residual)
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=k * 2 ** -10)

    def test_topk_dont_care_pixels_stay_zero(self):
        """All-zero value rows (the chunked demo's padding views, and any
        pixel whose retained mass fails sum > 0.5) must densify to sums
        <= 0.5 so the fusion don't-care rule (ref: fusion/Mesh.h:98)
        still skips them — the residual spread must NOT resurrect them."""
        import jax

        c, k = 9, 3
        vals = np.zeros((4, 5, k), np.float16)
        vals[0, 0] = [0.4, 0.05, 0.0]  # sum 0.45 <= 0.5: don't-care
        idx = np.tile(np.arange(k, dtype=np.uint8), (4, 5, 1))
        t = probs_io.TopKProbs(
            jax.device_put(vals), jax.device_put(idx), c
        )
        out = np.asarray(probs_io.densify(t))
        assert (out.sum(-1) <= 0.5).all()
        np.testing.assert_allclose(out[0, 0, :k], [0.4, 0.05, 0.0],
                                   atol=2 ** -11)
        assert (out[1:] == 0).all()

    def test_topk_mul_fusion_does_not_veto_dropped_classes(self):
        """aggregator='mul' with top-k maps: a class dropped from one
        view's top-K must survive fusion when other views support it.
        With exact zeros (the pre-round-5 behavior) the log-space
        accumulator adds w * NEG_LARGE once and the class can never
        win; with the residual floor the fused argmax matches dense mul
        fusion on strongly-supported primitives."""
        import jax

        from semantic_meshes import fusion

        c, k = 10, 3
        rng = np.random.default_rng(11)
        # view 1: class 7 dominant; view 2: class 7 NOT in top-3 but the
        # pixel is confident elsewhere (class 7 keeps small mass)
        p1 = np.full((4, 4, c), 0.02, np.float32)
        p1[..., 7] = 1.0 - 0.02 * (c - 1)
        p2 = rng.uniform(0.01, 0.02, (4, 4, c)).astype(np.float32)
        p2[..., 0] = 0.5
        p2[..., 1] = 0.3
        p2 /= p2.sum(-1, keepdims=True)
        prim = np.zeros((4, 4), np.uint32)  # all pixels -> primitive 0

        def fuse2(maps):
            agg = fusion.MeshAggregator(
                primitives=1, classes=c, aggregator="mul"
            )
            for m in maps:
                agg.add(jax.numpy.asarray(prim.T),
                        jax.numpy.transpose(jax.numpy.asarray(m), (1, 0, 2)))
            return np.asarray(agg.get())

        dense = fuse2([p1, p2])
        tks = []
        for m in (p1, p2):
            vals, idx = _topk_arrays(m, k)
            tks.append(np.asarray(probs_io.densify(probs_io.TopKProbs(
                jax.device_put(vals.astype(np.float16)),
                jax.device_put(idx), c,
            ))))
        assert (tks[1][..., 7] > 0).all()  # the floor, not a veto zero
        sparse = fuse2(tks)
        assert dense[0].argmax() == sparse[0].argmax() == 7


class TestLoad:
    def test_load_dense_casts_wire(self, tmp_path):
        probs = _softmax_maps()
        np.save(tmp_path / "f.npy", probs)  # f32 on disk
        loaded = probs_io.load(str(tmp_path / "f"), wire="f16")
        assert loaded.dtype == np.float16
        out = np.asarray(probs_io.densify(loaded))
        np.testing.assert_allclose(out, probs, atol=2 ** -11)

    def test_load_dense_u8_disk_to_wider_wire_dequantizes(self, tmp_path):
        probs = _softmax_maps()
        np.save(tmp_path / "q.npy", probs_io.quantize_u8(probs))
        loaded = probs_io.load(str(tmp_path / "q"), wire="f32")
        assert loaded.dtype == np.float32
        np.testing.assert_allclose(
            np.asarray(loaded), probs, atol=1 / 510 + 1e-6
        )

    def test_load_prefers_npz(self, tmp_path):
        probs = _softmax_maps(c=8)
        vals, idx = _topk_arrays(probs, 3)
        np.save(tmp_path / "m.npy", probs)
        np.savez(tmp_path / "m.npz", values=vals.astype(np.float16),
                 indices=idx, classes=np.int32(8))
        loaded = probs_io.load(str(tmp_path / "m"))
        assert isinstance(loaded, probs_io.TopKProbs)
        assert loaded.classes == 8

    def test_load_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            probs_io.load(str(tmp_path / "absent"))


class TestFusionParity:
    def test_topk_fusion_close_to_dense_for_peaked_maps(self):
        """Fusing top-6 maps approximates dense fusion: for softmax-peaked
        distributions the argmax class is always retained, so the fused
        argmax matches almost everywhere."""
        import jax

        from semantic_meshes import fusion

        probs = _softmax_maps(h=16, w=16, c=19, seed=3)
        vals, idx = _topk_arrays(probs, 6)
        prim = np.arange(16 * 16, dtype=np.uint32).reshape(16, 16) % 40

        def fuse(p_hwc):
            agg = fusion.MeshAggregator(
                primitives=40, classes=19, aggregator="sum"
            )
            agg.add(jax.numpy.asarray(prim.T),
                    jax.numpy.transpose(p_hwc, (1, 0, 2)))
            return np.asarray(agg.get())

        dense = fuse(jax.numpy.asarray(probs))
        t = probs_io.TopKProbs(
            jax.device_put(probs_io.quantize_u8(vals)),
            jax.device_put(idx), 19,
        )
        sparse = fuse(probs_io.densify(t))
        assert (dense.argmax(-1) == sparse.argmax(-1)).mean() > 0.95


class TestTopKDensify:
    """TopKDensify: the stable predict_fn for fused scans (a static jit
    argument in distributed.fuse_views — its hash/eq define the compile
    cache key)."""

    def test_matches_densify(self):
        import jax.numpy as jnp

        probs = _softmax_maps(seed=5)
        vals, idx = _topk_arrays(probs, 4)
        t = probs_io.TopKProbs(
            jnp.asarray(vals.astype(np.float16)), jnp.asarray(idx), 19
        )
        via_class = probs_io.TopKDensify(19)((t.values, t.indices))
        via_fn = probs_io.densify(t)
        np.testing.assert_array_equal(
            np.asarray(via_class), np.asarray(via_fn)
        )

    def test_equal_instances_hash_equal(self):
        # re-constructing TopKDensify(C) must not recompile the scan:
        # equal classes -> equal objects, equal hashes
        a, b = probs_io.TopKDensify(19), probs_io.TopKDensify(19)
        assert a == b and hash(a) == hash(b)
        assert a != probs_io.TopKDensify(20)
        assert a != probs_io.densify

    def test_weakrefable(self):
        # jax's jit cache takes weakrefs to static callables
        import weakref

        d = probs_io.TopKDensify(19)
        assert weakref.ref(d)() is d

    def test_fuse_views_scan_with_topk_predict_fn(self):
        """End-to-end through the scan: stacked top-k pairs + TopKDensify
        equal per-view dense fusion, and an all-zero pad view contributes
        nothing (fails the don't-care test, ref: fusion/Mesh.h:98)."""
        import jax.numpy as jnp

        from semantic_meshes import distributed, testing

        vertices, faces = testing.make_cube(2)
        W = H = 24
        cams = testing.make_ring_cameras(num_views=2, width=W, height=H)
        from semantic_meshes.data import stack_cameras

        rot, trans, fl, pp = stack_cameras(cams)
        C, k = 19, 3
        rng = np.random.default_rng(7)
        logits = rng.normal(0, 2, (2, H, W, C)).astype(np.float32)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        vals = np.empty((2, H, W, k), np.float16)
        idxs = np.empty((2, H, W, k), np.uint8)
        for i in range(2):
            v, ix = _topk_arrays(probs[i], k)
            vals[i], idxs[i] = v.astype(np.float16), ix
        # pad with a zero view (the ragged-tail convention of the demo)
        vals_p = np.concatenate([vals, np.zeros_like(vals[:1])])
        idxs_p = np.concatenate([idxs, np.zeros_like(idxs[:1])])
        rot_p = jnp.concatenate([rot, rot[-1:]])
        trans_p = jnp.concatenate([trans, trans[-1:]])
        fl_p = jnp.concatenate([fl, fl[-1:]])
        pp_p = jnp.concatenate([pp, pp[-1:]])
        P = len(faces)
        acc, overflow = distributed.fuse_views(
            jnp.asarray(vertices), jnp.asarray(faces),
            rot_p, trans_p, fl_p, pp_p,
            (jnp.asarray(vals_p), jnp.asarray(idxs_p)),
            jnp.float32(0.5), None,
            num_primitives=P, aggregator="sum", height=H, width=W,
            predict_fn=probs_io.TopKDensify(C),
        )
        assert int(overflow) == 0
        # oracle: the same scan over pre-densified maps, no pad view
        ref_acc, _ref_ov = distributed.fuse_views(
            jnp.asarray(vertices), jnp.asarray(faces), rot, trans, fl, pp,
            jnp.stack([probs_io.densify(probs_io.TopKProbs(
                jnp.asarray(vals[i]), jnp.asarray(idxs[i]), C
            )) for i in range(2)]),
            jnp.float32(0.5), None,
            num_primitives=P, aggregator="sum", height=H, width=W,
        )
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(ref_acc), rtol=1e-5, atol=1e-5
        )
