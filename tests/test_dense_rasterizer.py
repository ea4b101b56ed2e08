"""Dense (sort-binned + micro-fragment) rasterizer must match the XLA
oracle bit-for-bit (interpret mode on CPU; compiled on TPU via
SM_TEST_TPU=1)."""

import numpy as np
import pytest

from semantic_meshes import testing
from semantic_meshes.data import stack_cameras
from semantic_meshes.rasterize import dense, xla


def _check(vertices, faces, cam_args, h, w, **kw):
    t1, d1, o1 = xla.rasterize(vertices, faces, *cam_args, height=h, width=w)
    t2, d2, o2 = dense.rasterize(vertices, faces, *cam_args, height=h,
                                 width=w, **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    fin = np.isfinite(np.asarray(d1))
    np.testing.assert_array_equal(fin, np.isfinite(np.asarray(d2)))
    np.testing.assert_allclose(
        np.asarray(d1)[fin], np.asarray(d2)[fin], rtol=1e-6
    )
    return np.asarray(t2), int(o2)


def _simple_cam(w, h, f=40.0):
    return (
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        np.array([f, f], np.float32), np.array([w / 2, h / 2], np.float32),
    )


class TestDenseMatchesOracle:
    def test_mixed_sizes(self):
        """Scene exercising all three classes: micro (sub-pixel), small
        (tile-span), and big (global bucket) triangles."""
        rng = np.random.default_rng(3)
        verts = []
        tris = []
        # micro: tiny triangles scattered around z=4
        for i in range(30):
            c = rng.normal(size=3) * 0.8
            c[2] = 4 + rng.random()
            base = len(verts)
            verts += [c, c + [0.01, 0, 0], c + [0, 0.01, 0]]
            tris.append([base, base + 1, base + 2])
        # small: medium triangles
        for i in range(10):
            c = rng.normal(size=3) * 0.8
            c[2] = 5 + rng.random()
            base = len(verts)
            verts += [c, c + [0.6, 0, 0], c + [0, 0.6, 0]]
            tris.append([base, base + 1, base + 2])
        # big: image-spanning triangles
        base = len(verts)
        verts += [[-4, -4, 7], [4, -4, 7], [0, 5, 7]]
        tris.append([base, base + 1, base + 2])
        vertices = np.asarray(verts, np.float32)
        faces = np.asarray(tris, np.int32)
        tri, ov = _check(vertices, faces, _simple_cam(256, 96), 96, 256)
        assert ov == 0
        assert (tri >= 0).any()

    def test_cube_with_face_vertices(self):
        vertices, faces = testing.make_cube(5)
        cams = testing.make_ring_cameras(num_views=1, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        fv = vertices[faces]
        t1, d1, _ = xla.rasterize(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            height=96, width=256,
        )
        t2, d2, _ = dense.rasterize(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            face_vertices=fv, height=96, width=256,
        )
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))

    def test_row_band_offset(self):
        vertices, faces = testing.make_cube(4)
        cams = testing.make_ring_cameras(num_views=1, width=128, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        full = dense.rasterize(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            height=96, width=128,
        )
        band = dense.rasterize(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            np.float32(32.0), height=32, width=128,
        )
        np.testing.assert_array_equal(
            np.asarray(band[0]), np.asarray(full[0])[32:64]
        )
        # a raised routing threshold must respect row-band offsets too
        # (the fragment path applies y_offset per slot)
        band4 = dense.rasterize(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            np.float32(32.0), height=32, width=128, micro_max=4,
        )
        np.testing.assert_array_equal(
            np.asarray(band4[0]), np.asarray(full[0])[32:64]
        )

    def test_e_cap_overflow_reported(self):
        # force a tiny pair budget -> overflow must be reported
        vertices, faces = testing.make_cube(5)
        cams = testing.make_ring_cameras(num_views=1, width=256, height=192)
        rot, trans, fl, pp = stack_cameras(cams)
        # e_cap_factor=3 default is plenty; shrink via monkeypatched CHUNK?
        # instead: request e_cap_factor=... not exposed below CHUNK, so use
        # a big face count vs tiny cap by calling with e_cap_factor... the
        # floor is CHUNK=256 pairs; 300 faces * ~1 pair ≈ 312 > 256 only if
        # factor*T < pairs. Use factor such that e_cap < pairs: not possible
        # with integer factor >= 1 here, so just assert zero overflow on the
        # default path (the counter wiring is covered by _build_sorted_bins
        # unit behavior below).
        _, _, ov = dense.rasterize(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            height=192, width=256,
        )
        assert int(ov) == 0


class TestDenseRegimeFragmentBranch:
    def test_bg_fragment_branch_matches_oracle(self):
        """The micro path's dense-regime branch (4*T*2 >= H*W: background
        fragments + sort compaction, no scatter) must match the oracle
        bit-for-bit. Every other scene in this file has few triangles
        relative to the image and rides the set-scatter branch, so this is
        the only coverage of the branch the dense/scannet presets use.
        The oracle's per-tile cap is raised so IT doesn't overflow (its
        default 256 drops ~19k pairs on a scene this dense)."""
        vertices, faces = testing.make_cube(subdivisions=30)  # 10800 tris
        h, w = 64, 128
        assert 4 * len(faces) * 2 >= h * w  # dense-regime branch
        cams = testing.make_ring_cameras(num_views=1, width=w, height=h)
        rot, trans, fl, pp = stack_cameras(cams)
        cam = (rot[0], trans[0], fl[0], pp[0])
        t1, d1, o1 = xla.rasterize(
            vertices, faces, *cam, height=h, width=w,
            max_tris_per_tile=8192,
        )
        assert int(o1) == 0  # oracle output is trustworthy
        t2, d2, o2 = dense.rasterize(
            vertices, faces, *cam, height=h, width=w
        )
        assert int(o2) == 0
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        fin = np.isfinite(np.asarray(d1))
        np.testing.assert_array_equal(fin, np.isfinite(np.asarray(d2)))
        np.testing.assert_allclose(
            np.asarray(d1)[fin], np.asarray(d2)[fin], rtol=1e-6
        )


class TestMicroClassification:
    def test_micro_flag(self):
        from semantic_meshes.rasterize.xla import _make_setup
        import jax.numpy as jnp

        # one sub-pixel and one 50-px triangle
        vertices = np.array(
            [
                [0, 0, 4], [0.01, 0, 4], [0, 0.01, 4],
                [0, 0, 4], [2, 0, 4], [0, 2, 4],
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        cam = _simple_cam(128, 96)
        setup = _make_setup(
            jnp.asarray(vertices), jnp.asarray(faces),
            *cam, None,
        )
        micro = np.asarray(dense._is_micro(setup, jnp.float32(0)))
        assert micro[0] and not micro[1]

    def test_micro_max_routing_is_output_invariant(self):
        """The micro/streaming routing threshold (micro_max / SM_MICRO_MAX)
        only moves triangles between the fragment path and the streaming
        kernel — the rendered image is bit-identical to the xla oracle at
        every threshold, and the probe's (pairs, micro) stats shift
        accordingly."""
        rng = np.random.default_rng(7)
        verts, tris = [], []
        for _ in range(40):  # sizes spanning sub-px to ~8 px bboxes
            c = rng.normal(size=3) * 0.8
            c[2] = 4 + rng.random()
            s = rng.choice([0.01, 0.1, 0.3, 0.6])
            base = len(verts)
            verts += [c, c + [s, 0, 0], c + [0, s, 0]]
            tris.append([base, base + 1, base + 2])
        base = len(verts)
        verts += [[-4, -4, 7], [4, -4, 7], [0, 5, 7]]  # big triangle
        tris.append([base, base + 1, base + 2])
        vertices = np.asarray(verts, np.float32)
        faces = np.asarray(tris, np.int32)
        cam = _simple_cam(256, 96)
        prev_pairs = None
        for m in (1, 2, 4, 6):
            _check(vertices, faces, cam, 96, 256, micro_max=m)
            pairs, micro = (int(x) for x in np.asarray(
                dense.candidate_stats(
                    vertices, faces, *cam, height=96, width=256,
                    micro_max=m,
                )
            ))
            assert pairs + micro >= len(faces) - 1  # all visible routed
            if prev_pairs is not None:
                assert pairs <= prev_pairs  # wider micro -> fewer pairs
            prev_pairs = pairs

    def test_micro_max_compaction_budget(self):
        """micro_cap_rows keeps working when a raised threshold widens the
        micro class: compaction + the m^2-slot fragment path still match
        the oracle, and drops land in the overflow counter."""
        rng = np.random.default_rng(11)
        verts, tris = [], []
        for _ in range(30):
            c = rng.normal(size=3) * 0.6
            c[2] = 4 + rng.random()
            base = len(verts)
            verts += [c, c + [0.15, 0, 0], c + [0, 0.15, 0]]
            tris.append([base, base + 1, base + 2])
        vertices = np.asarray(verts, np.float32)
        faces = np.asarray(tris, np.int32)
        cam = _simple_cam(256, 96)
        pairs, micro = (int(x) for x in np.asarray(
            dense.candidate_stats(
                vertices, faces, *cam, height=96, width=256, micro_max=4,
            )
        ))
        assert micro > 8  # the raised threshold actually captured them
        # roomy budget: bit-identical through compaction
        _check(vertices, faces, cam, 96, 256, micro_max=4,
               micro_cap_rows=max(8, ((micro + 7) // 8) * 8))
        # under-budget: drops must be counted, never silent
        _, _, ov = dense.rasterize(
            vertices, faces, *cam, height=96, width=256, micro_max=4,
            micro_cap_rows=8,
        )
        assert int(ov) >= micro - 8


class TestUniSlotPrefix:
    """micro_split: rows [0, k) emit one fragment slot. The image must be
    exact for ANY k (uni rows whose bbox exceeds 1x1 in a view fall back
    to the streaming kernel), and the caller recipe — AND uni_eligible
    over the camera batch, stable-sort eligible-first, pass k — must
    yield zero overflow and oracle parity on every view."""

    def _scene(self):
        rng = np.random.default_rng(5)
        verts, tris = [], []
        for _ in range(60):
            c = rng.normal(size=3) * 0.8
            c[2] = 4 + rng.random()
            s = rng.choice([0.004, 0.01, 0.2, 0.5])
            base = len(verts)
            verts += [c, c + [s, 0, 0], c + [0, s, 0]]
            tris.append([base, base + 1, base + 2])
        base = len(verts)
        verts += [[-4, -4, 7], [4, -4, 7], [0, 5, 7]]
        tris.append([base, base + 1, base + 2])
        return np.asarray(verts, np.float32), np.asarray(tris, np.int32)

    def test_probed_split_matches_oracle_all_views(self):
        v, f = self._scene()
        cams = testing.make_ring_cameras(num_views=2, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        uni = np.ones(len(f), bool)
        for i in range(2):
            uni &= np.asarray(dense.uni_eligible(
                v, f, rot[i], trans[i], fl[i], pp[i], height=96, width=256,
            ))
        order = np.argsort(~uni, kind="stable")
        k = int(uni.sum())
        assert 0 < k < len(f)  # the scene actually exercises both classes
        fp = f[order]
        for i in range(2):
            cam = (rot[i], trans[i], fl[i], pp[i])
            _, ov = _check(v, fp, cam, 96, 256, micro_split=k)
            assert ov == 0

    def test_any_split_is_exact(self):
        """k = 0 (no prefix) and k = T (every row uni — bigger rows must
        fall back to the kernel) both match the oracle bit-for-bit."""
        v, f = self._scene()
        cams = testing.make_ring_cameras(num_views=1, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        cam = (rot[0], trans[0], fl[0], pp[0])
        for k in (0, len(f)):
            _check(v, f, cam, 96, 256, micro_split=k)

    def test_row_band_offset_with_split(self):
        """The uni prefix respects 'pixels'-axis row bands (y_offset)."""
        vertices, faces = testing.make_cube(40)  # sub-pixel at 128x96
        cams = testing.make_ring_cameras(num_views=1, width=128, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        uni = np.asarray(dense.uni_eligible(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            height=96, width=128,
        ))
        order = np.argsort(~uni, kind="stable")
        k = int(uni.sum())
        assert k > 100  # the prefix is actually exercised
        fp = faces[order]
        full = dense.rasterize(
            vertices, fp, rot[0], trans[0], fl[0], pp[0],
            height=96, width=128, micro_split=k,
        )
        band = dense.rasterize(
            vertices, fp, rot[0], trans[0], fl[0], pp[0], np.float32(32.0),
            height=32, width=128, micro_split=k,
        )
        np.testing.assert_array_equal(
            np.asarray(band[0]), np.asarray(full[0])[32:64]
        )

    def test_split_excludes_compaction(self):
        v, f = self._scene()
        cams = testing.make_ring_cameras(num_views=1, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        with pytest.raises(ValueError, match="mutually exclusive"):
            dense.rasterize(
                v, f, rot[0], trans[0], fl[0], pp[0], height=96, width=256,
                micro_split=4, micro_cap_rows=8,
            )

    def test_fuse_views_split_equals_fuse_views(self, monkeypatch):
        """The end-to-end wrapper (permute -> budget at split -> fused
        scan -> un-permute) reproduces fuse_views bit-for-bit on the
        dense backend, for every aggregator."""
        import jax.numpy as jnp

        from semantic_meshes import distributed

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        vertices, faces = testing.make_cube(40)  # sub-pixel at 128x96
        cams = testing.make_ring_cameras(num_views=3, width=128, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        rng = np.random.default_rng(0)
        probs = jnp.asarray(np.stack(
            [testing.random_probs(rng, 96, 128, 5) for _ in range(3)]
        ))
        for agg in ("sum", "summax", "mul"):
            kw = dict(num_primitives=len(faces), aggregator=agg,
                      height=96, width=128)
            a0, ov0 = distributed.fuse_views(
                vertices, faces, rot, trans, fl, pp, probs,
                jnp.float32(0.5), **kw,
            )
            a1, ov1 = distributed.fuse_views_split(
                vertices, faces, rot, trans, fl, pp, probs,
                jnp.float32(0.5), **kw,
            )
            assert int(ov0) == 0 and int(ov1) == 0
            np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def test_split_wins_gate(self):
        """The split-vs-compaction row-volume gate reproduces both
        measured v5e outcomes: the dense preset's shape (k/T = 0.82,
        all-micro) picks the split (+6.5% measured); the scannet preset's
        shape (k = 0, micro 8.7k of 99k at threshold 2) picks compaction
        (an ungated split measured a 17% regression). Ties (k = 0,
        micro-dominated) go to compaction — no permutation for free."""
        assert dense.split_wins(411_600, 500_000, 500_000, 2)
        assert not dense.split_wins(0, 99_372, 8_700, 2)
        assert not dense.split_wins(0, 500_000, 500_000, 2)
        # rows_split = k + m^2 (T - k) vs rows_comp = m^2 min(2 micro, T)
        assert dense.split_frag_rows(10, 100, 2) == 10 + 4 * 90
        assert dense.compact_frag_rows(30, 100, 2) == 4 * 60
        assert dense.compact_frag_rows(80, 100, 2) == 4 * 100

    def test_fuse_views_split_falls_back_when_compaction_wins(
            self, monkeypatch):
        """A scene with ZERO uni rows and few micro triangles (big
        triangles at high resolution — the scannet regime) must take the
        compaction fallback inside fuse_views_split and still reproduce
        fuse_views bit-for-bit."""
        import jax.numpy as jnp

        from semantic_meshes import distributed

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        vertices, faces = testing.make_cube(3)  # 108 big triangles
        cams = testing.make_ring_cameras(num_views=2, width=160, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        uni = np.asarray(dense.uni_eligible_batch(
            vertices, faces, rot, trans, fl, pp, height=96, width=160,
        ))
        stats = np.asarray(dense.candidate_stats_batch(
            vertices, faces, rot, trans, fl, pp, height=96, width=160,
        ))
        assert not dense.split_wins(
            int(uni.sum()), len(faces), int(stats[1])
        )  # the scene really is in the fallback regime
        rng = np.random.default_rng(1)
        probs = jnp.asarray(np.stack(
            [testing.random_probs(rng, 96, 160, 4) for _ in range(2)]
        ))
        kw = dict(num_primitives=len(faces), aggregator="sum",
                  height=96, width=160)
        a0, ov0 = distributed.fuse_views(
            vertices, faces, rot, trans, fl, pp, probs, jnp.float32(0.5),
            **kw,
        )
        a1, ov1 = distributed.fuse_views_split(
            vertices, faces, rot, trans, fl, pp, probs, jnp.float32(0.5),
            **kw,
        )
        assert int(ov0) == 0 and int(ov1) == 0
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def test_candidate_stats_batch_equals_per_view_loop(self):
        v, f = self._scene()
        cams = testing.make_ring_cameras(num_views=4, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        loop = np.stack([
            np.asarray(dense.candidate_stats(
                v, f, rot[i], trans[i], fl[i], pp[i], height=96, width=256,
            ))
            for i in range(4)
        ]).max(axis=0)
        batch = np.asarray(dense.candidate_stats_batch(
            v, f, rot, trans, fl, pp, height=96, width=256,
        ))
        np.testing.assert_array_equal(batch, loop)

    def test_fuse_views_split_clip_near_plans_compaction(self, monkeypatch):
        """clip_near cannot ride the uni prefix (it permutes faces, not
        clip pieces): plan_fuse must plan compaction instead (no
        permutation) and fuse_views_split must still equal fuse_views."""
        import jax.numpy as jnp

        from semantic_meshes import distributed

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        vertices, faces = testing.make_cube(20)
        cams = testing.make_ring_cameras(num_views=2, width=128, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        plan = distributed.plan_fuse(
            vertices, faces, rot, trans, fl, pp, height=96, width=128,
            clip_near=True,
        )
        assert plan.remap is None and plan.split_k == 0
        rng = np.random.default_rng(2)
        probs = jnp.asarray(np.stack(
            [testing.random_probs(rng, 96, 128, 4) for _ in range(2)]
        ))
        kw = dict(num_primitives=len(faces), aggregator="sum",
                  height=96, width=128, clip_near=True)
        a0, ov0 = distributed.fuse_views(
            vertices, faces, rot, trans, fl, pp, probs, jnp.float32(0.5),
            **kw,
        )
        a1, ov1 = distributed.fuse_views_split(
            vertices, faces, rot, trans, fl, pp, probs, jnp.float32(0.5),
            **kw,
        )
        assert int(ov0) == 0 and int(ov1) == 0
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def test_plan_fuse_planned_equals_fuse_views(self, monkeypatch):
        """plan_fuse + fuse_views_planned (the two-step form bench.py and
        the chunked demo ride) reproduces fuse_views bit-for-bit, with
        the plan actually taking the split on a sub-pixel scene."""
        import jax.numpy as jnp

        from semantic_meshes import distributed

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        vertices, faces = testing.make_cube(40)  # sub-pixel at 128x96
        cams = testing.make_ring_cameras(num_views=3, width=128, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        plan = distributed.plan_fuse(
            vertices, faces, rot, trans, fl, pp, height=96, width=128,
        )
        assert plan.split_k > 0 and plan.remap is not None
        rng = np.random.default_rng(3)
        probs = jnp.asarray(np.stack(
            [testing.random_probs(rng, 96, 128, 5) for _ in range(3)]
        ))
        kw = dict(num_primitives=len(faces), aggregator="sum",
                  height=96, width=128)
        a0, ov0 = distributed.fuse_views(
            vertices, faces, rot, trans, fl, pp, probs, jnp.float32(0.5),
            **kw,
        )
        a1, ov1 = distributed.fuse_views_planned(
            plan, vertices, rot, trans, fl, pp, probs, jnp.float32(0.5),
            **kw,
        )
        assert int(ov0) == 0 and int(ov1) == 0
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))

    def test_batched_probes_equal_per_view_loop(self):
        """uni_eligible_batch / candidate_count_batch (one scan dispatch,
        one sync per scene) reproduce the per-view loops they replace —
        the loops cost one ~25 ms tunnel readback PER VIEW on hardware."""
        v, f = self._scene()
        cams = testing.make_ring_cameras(num_views=4, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        loop_uni = np.ones(len(f), bool)
        for i in range(4):
            loop_uni &= np.asarray(dense.uni_eligible(
                v, f, rot[i], trans[i], fl[i], pp[i], height=96, width=256,
            ))
        batch_uni = np.asarray(dense.uni_eligible_batch(
            v, f, rot, trans, fl, pp, height=96, width=256,
        ))
        np.testing.assert_array_equal(batch_uni, loop_uni)
        k = int(loop_uni.sum())
        fp = f[np.argsort(~loop_uni, kind="stable")]
        loop_pairs = max(
            int(dense.candidate_count(
                v, fp, rot[i], trans[i], fl[i], pp[i],
                height=96, width=256, micro_split=k,
            ))
            for i in range(4)
        )
        batch_pairs = int(dense.candidate_count_batch(
            v, fp, rot, trans, fl, pp, height=96, width=256, micro_split=k,
        ))
        assert batch_pairs == loop_pairs

    def test_facade_four_tuple(self):
        import semantic_meshes.rasterize as rast

        v, f = self._scene()
        cams = testing.make_ring_cameras(num_views=1, width=256, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        order, k = dense.uni_order(
            v, f, rot[:1], trans[:1], fl[:1], pp[:1], height=96, width=256,
        )
        fp = f[order]
        pairs = int(dense.candidate_count(
            v, fp, rot[0], trans[0], fl[0], pp[0], height=96, width=256,
            micro_split=k,
        ))
        t0, _, _ = xla.rasterize(
            v, fp, rot[0], trans[0], fl[0], pp[0], height=96, width=256
        )
        t1, _, ov = rast.rasterize(
            v, fp, rot[0], trans[0], fl[0], pp[0], height=96, width=256,
            backend="dense", dense_e_cap=(2 * pairs, 0, None, k),
        )
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
        assert int(ov) == 0

    def test_tri_ids_remap_identity_on_mixed_scene(self):
        """rasterize(faces[perm], tri_ids=perm) must reproduce
        rasterize(faces) bit-for-bit on a scene that routes rows to BOTH
        the micro fragment path and the streaming kernel — the id
        substitution rides the fragment-sort payload and the packed
        candidate table (the zero-cost remap a uni-split FusePlan uses to
        return its accumulator in original face order; the per-pixel
        gather it replaced cost ~5.7 ms/view on v5e and ate the split's
        measured win)."""
        import jax.numpy as jnp

        cv, cf = testing.make_cube(24)  # sub-pixel at 128x96 -> micro
        big_v = np.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
        ) * 0.9
        big_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32) + len(cv)
        v = np.concatenate([cv, big_v]).astype(np.float32)
        f = np.concatenate([cf, big_f]).astype(np.int32)
        cam = testing.make_ring_cameras(num_views=1, width=128, height=96)[0]
        args = (
            np.asarray(cam.rotation, np.float32),
            np.asarray(cam.translation, np.float32),
            np.asarray(cam.focal_lengths, np.float32),
            np.asarray(cam.principal_point, np.float32),
        )
        micro = np.asarray(dense.uni_eligible(
            v, f, *args, height=96, width=128
        ))
        assert micro.any() and (~micro).any(), "need micro AND kernel rows"
        i0, z0, ov0 = dense.rasterize(v, f, *args, height=96, width=128)
        perm = np.random.default_rng(0).permutation(len(f)).astype(np.int32)
        i1, z1, ov1 = dense.rasterize(
            v, f[perm], *args, height=96, width=128,
            tri_ids=jnp.asarray(perm),
        )
        np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        assert int(ov0) == int(ov1) == 0

    def test_tri_ids_clip_near_raises(self):
        v, f = testing.make_cube(4)
        args = _simple_cam(64, 48)
        with pytest.raises(ValueError, match="clip_near"):
            dense.rasterize(
                v, f, *args, height=48, width=64, clip_near=True,
                tri_ids=np.arange(len(f), dtype=np.int32),
            )


class TestAutoRouting:
    def test_pick_micro_max_cost_model(self):
        # pairs collapse to zero by threshold 4 at negligible micro
        # growth: the model must take the first zero-pair threshold (the
        # binning sort and kernel vanish) and not overshoot to 5 (more
        # fragment slots for nothing)
        curve_cliff = [(10**6, 0), (5 * 10**5, 0), (0, 100), (0, 100)]
        assert dense.pick_micro_max(curve_cliff, 2000) == 4
        # dense-preset-shaped curve: already all-micro at 2; raising the
        # threshold only multiplies fragment rows -> must pick 2
        curve_dense = [(0, 499392), (0, 499392), (0, 499392), (0, 499392)]
        assert dense.pick_micro_max(curve_dense, 499392) == 2
        # the real scannet-preset curve: whatever the coefficients say,
        # the pick must be one of the probed thresholds and reproducible
        curve_scannet = [(106714, 8701), (39412, 66810), (2504, 97360),
                         (0, 99372)]
        m = dense.pick_micro_max(curve_scannet, 99372)
        assert m in dense.ROUTING_THRESHOLDS
        assert m == dense.pick_micro_max(curve_scannet, 99372)

    def test_round4_calibration_reproduces_measured_ordering(self):
        # The round-4 in-pipeline fit (dense.py ROUTE_ALPHA/BETA comment):
        # scannet-preset e2e at SM_MICRO_MAX=2/3/4 measured
        # 45.53/44.72/46.51 ms/view on v5e — m=3 fastest. Under the
        # shipped default coefficients the model must reproduce that pick
        # on the preset's max-over-views routing curve. Skipped when the
        # user overrides the coefficients (they are recalibration knobs).
        import os

        if any(os.environ.get(k) for k in
               ("SM_ROUTE_ALPHA", "SM_ROUTE_BETA", "SM_ROUTE_GAMMA")):
            pytest.skip("coefficient override active")
        curve_scannet_r4 = [(106727, 18799), (44160, 66810),
                            (11975, 97360), (623, 99372)]
        assert dense.pick_micro_max(curve_scannet_r4, 99372) == 3

    def test_budget_margin_matches_cap_policy(self):
        from semantic_meshes.render import _DenseCapPolicy

        assert dense.BUDGET_MARGIN == _DenseCapPolicy.MARGIN

    def test_floor_disables_gamma_credit(self):
        # pairs collapse to zero at threshold 4 — but a grow-only pair
        # floor keeps the binning sort alive, so the zero-pair credit
        # must not tip the pick away from the cheaper-fragment threshold
        curve = [(1000, 0), (500, 200000), (0, 100000), (0, 100000)]
        rows = 10**6
        assert dense.pick_micro_max(curve, rows) == 4
        assert dense.pick_micro_max(curve, rows, min_pairs_budget=256) == 2

    def test_routing_stats_matches_candidate_stats(self):
        vertices, faces = testing.make_cube(8)
        cams = testing.make_ring_cameras(num_views=1, width=128, height=96)
        rot, trans, fl, pp = stack_cameras(cams)
        curve = np.asarray(dense.routing_stats(
            vertices, faces, rot[0], trans[0], fl[0], pp[0],
            height=96, width=128,
        ))
        for i, m in enumerate(dense.ROUTING_THRESHOLDS):
            single = np.asarray(dense.candidate_stats(
                vertices, faces, rot[0], trans[0], fl[0], pp[0],
                height=96, width=128, micro_max=m,
            ))
            np.testing.assert_array_equal(curve[i], single)

    def test_renderer_auto_mode_matches_fixed(self, monkeypatch):
        """SM_MICRO_MAX=auto: the renderer probes the routing curve once,
        budgets at the picked threshold, and renders identically to the
        fixed-threshold path."""
        from types import SimpleNamespace

        from semantic_meshes import render as render_mod

        vertices, faces = testing.make_cube(8)
        mesh = SimpleNamespace(vertices=vertices, faces=faces)
        cams = testing.make_ring_cameras(num_views=1, width=128, height=96)

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        fixed = render_mod.triangles(mesh)
        i0, d0 = fixed.render(cams[0])

        monkeypatch.setattr(dense, "MICRO_AUTO", True)
        auto = render_mod.triangles(mesh)
        i1, d1 = auto.render(cams[0])
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        # depth agrees to a few ulp only: the auto pick moves these
        # triangles from the streaming kernel to the fragment path, which
        # associates the inverse-z multiply-adds differently (measured
        # ~4e-6 rel worst case on this scene; winner identity — the real
        # contract — is exact above)
        d0, d1 = np.asarray(d0), np.asarray(d1)
        fin = np.isfinite(d0)
        np.testing.assert_array_equal(fin, np.isfinite(d1))
        np.testing.assert_allclose(d0[fin], d1[fin], rtol=1e-5)
        cap = auto.dense_cap_policy._cap[(96, 128)]
        assert len(cap) == 3 and cap[2] in dense.ROUTING_THRESHOLDS
        assert int(auto.overflow_total()) == 0

    def test_texels_renderer_auto_mode_matches_fixed(
        self, monkeypatch, tmp_path
    ):
        """The texels renderer shares the cap policy: auto mode must give
        identical texel indices (the winner contract is exact — only
        depth carries cross-path ulp noise)."""
        from semantic_meshes import data, render as render_mod
        from semantic_meshes.io import ply as plyio

        vertices, faces = testing.make_cube(6)
        p = tmp_path / "m.ply"
        plyio.write_mesh(str(p), vertices, faces)
        mesh = data.Ply(str(p))
        cams = testing.make_ring_cameras(num_views=2, width=128, height=96)

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        i0, _ = render_mod.texels(mesh, cams, 1.0).render(cams[0])

        monkeypatch.setattr(dense, "MICRO_AUTO", True)
        auto = render_mod.texels(mesh, cams, 1.0)
        i1, _ = auto.render(cams[0])
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        cap = auto.dense_cap_policy._cap[(96, 128)]
        assert len(cap) == 3 and cap[2] in dense.ROUTING_THRESHOLDS
        assert int(auto.overflow_total()) == 0


class TestAdaptiveCandidateBudget:
    def _scene(self, seed=0, t=400):
        rng = np.random.default_rng(seed)
        vertices = rng.normal(size=(t, 3)).astype(np.float32) * 0.5
        vertices[:, 2] += 4.0
        faces = rng.integers(0, t, size=(t, 3)).astype(np.int32)
        cam = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
               np.array([80.0, 80.0], np.float32),
               np.array([64.0, 32.0], np.float32))
        return vertices, faces, cam

    def test_candidate_count_matches_binning(self):
        """Closed-form count == the sort-based binning's total_pairs."""
        import jax.numpy as jnp
        from semantic_meshes.rasterize import xla as xr

        vertices, faces, cam = self._scene()
        H, W = 64, 256
        count = int(dense.candidate_count(
            vertices, faces, *cam, height=H, width=W
        ))
        setup = xr._make_setup(
            jnp.asarray(vertices), jnp.asarray(faces, jnp.int32), *cam,
            None, False,
        )
        e_cap = dense._cdiv(max(3 * len(faces), dense.CHUNK),
                            dense.CHUNK) * dense.CHUNK
        _, starts, overflow, _ = dense._build_sorted_bins(
            setup, H, W, jnp.float32(0), e_cap, 1024
        )
        B = starts.shape[0] - 2
        assert int(overflow) == 0
        assert count == int(starts[B + 1])

    def test_zero_budget_pure_micro_scene(self):
        """e_cap_rows=0 (probe saw no candidates) skips binning entirely
        and still matches the oracle bit-for-bit on an all-micro scene."""
        rng = np.random.default_rng(7)
        n = 300
        c = rng.normal(size=(n, 3)).astype(np.float32) * 0.8
        c[:, 2] = 4 + rng.random(n)
        vertices = np.concatenate(
            [c, c + [0.01, 0, 0], c + [0, 0.01, 0]], axis=0
        ).astype(np.float32)
        faces = np.stack(
            [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], -1
        ).astype(np.int32)
        cam = _simple_cam(256, 96)
        H, W = 96, 256
        assert int(dense.candidate_count(
            vertices, faces, *cam, height=H, width=W)) == 0
        _, ov = _check(vertices, faces, cam, H, W, e_cap_rows=0)
        assert ov == 0

    def test_zero_budget_reports_candidates_as_overflow(self):
        """With e_cap_rows=0, a later frame that does produce candidates
        drops them but reports every dropped pair in overflow; micro
        triangles still render."""
        vertices = np.array(
            [
                # micro: covers pixel center (64.5, 48.5) at f=40, z=4
                [0.04, 0.04, 4], [0.07, 0.04, 4], [0.04, 0.07, 4],
                [0, 0, 5], [2, 0, 5], [0, 2, 5],          # tile-span
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        cam = _simple_cam(128, 96)
        H, W = 96, 128
        count = int(dense.candidate_count(
            vertices, faces, *cam, height=H, width=W))
        assert count > 0
        tri, _, ov = dense.rasterize(
            vertices, faces, *cam, height=H, width=W, e_cap_rows=0
        )
        tri = np.asarray(tri)
        assert int(ov) == count
        assert (tri == 0).any() and not (tri == 1).any()

    def test_tight_budget_bit_identical(self):
        """rasterize with e_cap_rows == exact count matches the default
        budget bit-for-bit."""
        vertices, faces, cam = self._scene(seed=3)
        H, W = 64, 256
        count = int(dense.candidate_count(
            vertices, faces, *cam, height=H, width=W
        ))
        a = dense.rasterize(vertices, faces, *cam, height=H, width=W)
        b = dense.rasterize(vertices, faces, *cam, height=H, width=W,
                            e_cap_rows=count)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        fin = np.isfinite(np.asarray(a[1]))
        np.testing.assert_array_equal(np.asarray(a[1])[fin],
                                      np.asarray(b[1])[fin])
        assert int(b[2]) == 0  # exact budget: nothing dropped

    def test_undersized_budget_counts_overflow(self):
        vertices, faces, cam = self._scene(seed=4)
        H, W = 64, 256
        count = int(dense.candidate_count(
            vertices, faces, *cam, height=H, width=W
        ))
        if count <= dense.CHUNK:
            pytest.skip("scene too small to undershoot the CHUNK floor")
        _, _, ov = dense.rasterize(vertices, faces, *cam, height=H, width=W,
                                   e_cap_rows=1)  # rounds up to CHUNK
        assert int(ov) == count - dense.CHUNK

    def test_n_global_cap_counts_overflow(self):
        """Big triangles beyond the kernel's n_global clamp must be counted
        in the overflow, not silently dropped (a dropped nearer surface
        would fuse the wrong primitive ids with no warning)."""
        n_big = 20
        verts = []
        tris = []
        for i in range(n_big):
            z = 3.0 + 0.1 * i  # nearest (i=0) wins everywhere
            base = len(verts)
            verts += [[-40, -40, z], [40, -40, z], [0, 50, z]]
            tris.append([base, base + 1, base + 2])
        vertices = np.asarray(verts, np.float32)
        faces = np.asarray(tris, np.int32)
        cam = _simple_cam(256, 96)

        tri_full, _, ov_full = dense.rasterize(
            vertices, faces, *cam, height=96, width=256
        )
        assert int(ov_full) == 0
        assert (np.asarray(tri_full) == 0).all()  # nearest covers all

        tri_cap, _, ov_cap = dense.rasterize(
            vertices, faces, *cam, height=96, width=256, n_global=1
        )
        assert int(ov_cap) == n_big - 1
        # with the cap only triangle 0 was tested — image still id 0
        assert (np.asarray(tri_cap) == 0).all()

    def test_renderer_policy_probes_once(self, tmp_path, monkeypatch):
        """With the dense backend forced, the renderer probes the exact
        count once per resolution and renders bit-identically."""
        import semantic_meshes
        from semantic_meshes import testing as sm_testing
        from semantic_meshes.io.ply import write_mesh

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        vertices, faces = sm_testing.make_cube(subdivisions=6)
        write_mesh(tmp_path / "c.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "c.ply"))
        cams = sm_testing.make_ring_cameras(num_views=2, width=256,
                                            height=128)
        r = semantic_meshes.render.triangles(mesh, backend="dense")
        i0, d0 = r.render(cams[0])
        key = (128, 256)
        assert key in r.dense_cap_policy._cap
        cap = r.dense_cap_policy._cap[key]
        assert cap[0] >= 2  # 2x margin over >= 1 pair
        assert cap[1] >= 0  # micro fragment budget rides along
        # second render at the same resolution reuses the cached cap
        r.render(cams[1])
        assert r.dense_cap_policy._cap[key] == cap
        # parity with the default budget
        r2 = semantic_meshes.render.triangles(mesh, backend="dense")
        r2.dense_cap_policy._cap[key] = None  # force default budget
        monkeypatch.setattr(
            type(r2.dense_cap_policy), "lookup",
            lambda self, k, probe: None,
        )
        i1, d1 = r2.render(cams[0])
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        # winners are identical; depth may wobble a few ulps ACROSS
        # programs on CPU interpret mode (different budgets compile
        # different XLA programs, whose fusion contexts evaluate the
        # kernel's 1/inv_z slightly differently — measured 3.8e-6 max
        # rel). Each program is itself deterministic, and the compiled
        # TPU kernel is bit-identical across budgets.
        np.testing.assert_allclose(
            np.asarray(d0), np.asarray(d1), rtol=1e-5
        )

    def test_micro_compaction_matches_and_counts_drops(self):
        """micro_cap_rows gathers only the micro triangles before the
        fragment sorts (4*T slots -> 4*cap). Output must be identical to
        the uncompacted path; a starved budget must spill the dropped
        micro count into overflow, never silently."""
        import jax.numpy as jnp

        from semantic_meshes import testing as sm_testing
        from semantic_meshes.data import stack_cameras

        vertices, faces = sm_testing.make_cube(subdivisions=8)  # 768 tris
        cams = sm_testing.make_ring_cameras(
            num_views=1, width=256, height=96, radius=6.0
        )
        rot, trans, fl, pp = stack_cameras(cams)
        args = (jnp.asarray(vertices), jnp.asarray(faces), rot[0], trans[0],
                fl[0], pp[0])
        stats = np.asarray(
            dense.candidate_stats(*args, height=96, width=256)
        )
        pairs, micro = int(stats[0]), int(stats[1])
        assert micro > 16  # the scene exercises the compaction

        i0, z0, ov0 = dense.rasterize(
            *args, height=96, width=256, e_cap_rows=2 * pairs
        )
        i1, z1, ov1 = dense.rasterize(
            *args, height=96, width=256, e_cap_rows=2 * pairs,
            micro_cap_rows=2 * micro,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))
        assert int(ov0) == 0 and int(ov1) == 0

        _, _, ov2 = dense.rasterize(
            *args, height=96, width=256, e_cap_rows=2 * pairs,
            micro_cap_rows=8,
        )
        assert int(ov2) >= micro - 8

    def test_zero_budget_recheck_warns(self, tmp_path, monkeypatch, caplog):
        """An all-micro probe frame pins the dense candidate budget to 0;
        a later frame whose triangles DO produce candidates must warn
        (synchronous re-check at frame 2), not lose geometry silently
        until overflow_total() (ADVICE r2)."""
        import logging

        import semantic_meshes
        from semantic_meshes import testing as sm_testing
        from semantic_meshes.io.ply import write_mesh

        monkeypatch.setenv("SM_RASTERIZER", "dense")
        vertices, faces = sm_testing.make_cube(subdivisions=4)
        write_mesh(tmp_path / "c.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "c.ply"))
        far = sm_testing.make_ring_cameras(num_views=1, width=256,
                                           height=128, radius=80.0)[0]
        close = sm_testing.make_ring_cameras(num_views=1, width=256,
                                             height=128, radius=2.0)[0]
        r = semantic_meshes.render.triangles(mesh, backend="dense")
        with caplog.at_level(logging.WARNING, logger="semantic_meshes"):
            r.render(far)  # probe frame: every triangle micro -> budget 0
            assert r.dense_cap_policy._cap[(128, 256)][0] == 0
            assert not any("overflow" in m for m in caplog.messages)
            r.render(close)  # frame 2: candidates exist, all spill
        assert any(
            "re-probe" in m for m in caplog.messages
        ), caplog.messages
        dropped = r.overflow_total()
        assert dropped > 0
        # the breach invalidated the zero cap: the next render re-probes
        # (grow-only) and stops dropping
        assert (128, 256) not in r.dense_cap_policy._cap
        r.render(close)
        assert r.dense_cap_policy._cap[(128, 256)][0] > 0
        assert r.overflow_total() == dropped
