"""Texel-mode tests: the reference's manual debug harness
(python/scripts/debug_render_texels.py) promoted to assertions, plus unit
coverage of the resolution precompute."""

import math

import numpy as np
import pytest

import semantic_meshes
from semantic_meshes.geometry import look_at
from semantic_meshes.io.ply import write_mesh

SIZE = 400
TPP = 0.05


@pytest.fixture(scope="module")
def camera():
    rotation, translation = look_at(
        [-0.5, -0.5, 4.0], [-0.5, -0.5, 0.0], [0.0, 1.0, 0.0]
    )
    resolution = np.asarray([SIZE, SIZE])
    pp = resolution.astype("float32") / 2.0
    fov_y = math.radians(45.0)
    fl = np.asarray(
        [pp[0] / math.tan(fov_y / 2.0), pp[1] / math.tan(fov_y / 2.0)]
    )
    return semantic_meshes.data.Camera(
        rotation, translation, resolution, fl, pp
    )


VERTEX = np.array([(0.4, 0, 0), (0.5, 1, 0), (0.6, 0, 0)], np.float32)
ORDERS = [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]]


def _render_order(tmp_path, camera, order):
    mesh_file = tmp_path / f"mesh-{'-'.join(map(str, order))}.ply"
    write_mesh(mesh_file, VERTEX, np.asarray([order], np.int32), binary=False)
    mesh = semantic_meshes.data.Ply(str(mesh_file))
    renderer = semantic_meshes.render.texels(mesh, [camera], TPP)
    idx, depth = renderer.render(camera)
    idx = np.asarray(idx).T.astype(np.int64)
    idx[idx == 0xFFFFFFFF] = -1
    return renderer, idx, np.asarray(depth).T


class TestSixPermutations:
    def test_all_orderings_consistent(self, tmp_path, camera):
        results = [
            _render_order(tmp_path, camera, order) for order in ORDERS
        ]
        counts = [r[0].getPrimitivesNum() for r in results]
        # same triangle -> same texel count for every vertex ordering
        assert len(set(counts)) == 1
        count = counts[0]
        # count identity: count = s(s+1)/2 for integer s
        # (ref: debug_render_texels.py:71-73)
        s = int(-0.5 + math.sqrt(0.25 + 2 * count))
        assert s * (s + 1) // 2 == count

        cover0 = results[0][1] >= 0
        for _, idx, depth in results:
            cover = idx >= 0
            # identical pixel coverage for every ordering
            np.testing.assert_array_equal(cover, cover0)
            # every rendered index in range
            assert idx[cover].min() >= 0
            assert idx[cover].max() < count
            # all texels are hit (image is much finer than the texel grid)
            assert len(np.unique(idx[cover])) == count
            # depth identical across orderings
            np.testing.assert_allclose(
                depth[cover], results[0][2][cover], rtol=1e-5
            )

    def test_texels_form_contiguous_regions(self, tmp_path, camera):
        """Each texel's pixel set must be spatially connected-ish: check
        that the mean intra-texel pixel spread is much smaller than the
        triangle's extent (catches index-scrambling bugs)."""
        _, idx, _ = _render_order(tmp_path, camera, [0, 1, 2])
        cover = idx >= 0
        ys, xs = np.nonzero(cover)
        ids = idx[cover]
        tri_extent = max(np.ptp(ys), np.ptp(xs))
        count = ids.max() + 1
        spreads = []
        for t in range(count):
            sel = ids == t
            if sel.sum() < 2:
                continue
            spreads.append(max(np.ptp(ys[sel]), np.ptp(xs[sel])))
        s = int(-0.5 + math.sqrt(0.25 + 2 * count))
        # a texel spans ~1/s of the triangle; allow 3x slack for perspective
        assert np.mean(spreads) < 3 * tri_extent / s


class TestResolutionPrecompute:
    def test_larger_on_screen_triangles_get_more_texels(self, tmp_path,
                                                        camera):
        # two triangles: one big, one small (screen area ~100x smaller)
        vertices = np.array(
            [
                (0.4, 0, 0), (0.5, 1, 0), (0.6, 0, 0),
                (-1.4, 0, 0), (-1.39, 0.1, 0), (-1.38, 0, 0),
            ],
            np.float32,
        )
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        mesh_file = tmp_path / "two.ply"
        write_mesh(mesh_file, vertices, faces)
        mesh = semantic_meshes.data.Ply(str(mesh_file))
        renderer = semantic_meshes.render.texels(mesh, [camera], TPP)
        res = np.asarray(renderer.resolutions)
        assert res[0] > res[1] >= 1

    def test_unseen_triangle_gets_zero_texels(self, tmp_path, camera):
        vertices = np.array(
            [
                (0.4, 0, 0), (0.5, 1, 0), (0.6, 0, 0),
                (0.4, 0, 100), (0.5, 1, 100), (0.6, 0, 100),  # behind cam
            ],
            np.float32,
        )
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        mesh_file = tmp_path / "two.ply"
        write_mesh(mesh_file, vertices, faces)
        mesh = semantic_meshes.data.Ply(str(mesh_file))
        renderer = semantic_meshes.render.texels(mesh, [camera], TPP)
        res = np.asarray(renderer.resolutions)
        assert res[1] == 0
        first = np.asarray(renderer.first_texel_index)
        assert renderer.getPrimitivesNum() == int(
            res[0] * (res[0] + 1) // 2
        )
        assert first[1] == renderer.getPrimitivesNum()


class TestAffineShaderEquivalence:
    def test_affine_texel_path_matches_barycentric_oracle(self, tmp_path,
                                                          camera):
        """The packed-affine texel shader (one row gather per pixel) must
        agree with the direct barycentric formulation."""
        import jax.numpy as jnp

        from semantic_meshes import geometry
        from semantic_meshes.render import _texel_prim_image
        from semantic_meshes.rasterize import xla as rx

        rng = np.random.default_rng(4)
        vertices = rng.normal(size=(30, 3)).astype(np.float32) * 0.4
        vertices[:, 2] -= 0.0  # camera looks from z=4 toward 0
        faces = np.stack(
            [rng.choice(30, 3, replace=False) for _ in range(20)]
        ).astype(np.int32)
        h, w = SIZE, SIZE
        tri, _, _ = rx.rasterize(
            vertices, faces, camera.rotation, camera.translation,
            camera.focal_lengths, camera.principal_point,
            height=h, width=w,
        )
        resolutions = rng.integers(1, 5, len(faces)).astype(np.int32)
        counts = resolutions * (resolutions + 1) // 2
        first = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
        P = int(counts.sum())

        got = np.asarray(_texel_prim_image(
            vertices, faces, camera.rotation, camera.translation,
            camera.focal_lengths, camera.principal_point, tri,
            jnp.asarray(resolutions), jnp.asarray(first), P,
        ))

        bary = np.asarray(rx.barycentrics_at_pixels(
            vertices, faces, camera.rotation, camera.translation,
            camera.focal_lengths, camera.principal_point, tri,
        ))
        tri_np = np.asarray(tri)
        covered = tri_np >= 0
        res_px = resolutions[np.maximum(tri_np, 0)]
        rel = np.asarray(geometry.texel_index(
            jnp.asarray(bary), jnp.asarray(np.maximum(res_px, 1))
        ))
        want = np.where(covered, first[np.maximum(tri_np, 0)] + rel, P)

        diff = got != want
        # both formulations round differently exactly on texel-grid
        # boundaries; a tiny fraction of pixels may differ
        assert diff[covered].mean() < 0.002, int(diff[covered].sum())
