"""Face-count bucketing: padding meshes to coarse size buckets must leave
every render output bit-identical while collapsing jit cache keys."""

import numpy as np
import pytest

import semantic_meshes
from semantic_meshes import testing
from semantic_meshes.io.ply import write_mesh
from semantic_meshes.render import _face_bucket, _pad_faces


class TestBucketFn:
    def test_monotone_and_bounded(self):
        prev = 0
        for t in [1, 7, 1024, 1025, 2100, 5000, 49152, 100000, 2_000_000]:
            b = _face_bucket(t)
            assert b >= t
            assert b >= prev
            prev = b
            if t > 1024:
                assert b <= t * 1.26, (t, b)

    def test_small_counts_share_one_bucket(self):
        assert _face_bucket(1) == _face_bucket(1024) == 1024

    def test_nearby_scene_sizes_collapse(self):
        # the point of the feature: 43k- and 45k-face scenes compile once
        assert _face_bucket(43000) == _face_bucket(45000)

    def test_pad_faces_degenerate(self):
        import jax.numpy as jnp

        faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
        verts = jnp.zeros((3, 3), jnp.float32)
        padded, real = _pad_faces(faces, verts)
        assert real == 1
        assert padded.shape[0] == 1024
        assert (np.asarray(padded[1:]) == 0).all()


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucket")
    vertices, faces = testing.make_cube(subdivisions=3)  # 108 faces
    write_mesh(tmp / "cube.ply", vertices, faces)
    mesh = semantic_meshes.data.Ply(str(tmp / "cube.ply"))
    cams = testing.make_ring_cameras(num_views=2, width=128, height=96)
    return mesh, cams


class TestBucketedRenderParity:
    def test_triangles_bit_identical(self, scene):
        mesh, cams = scene
        r0 = semantic_meshes.render.triangles(mesh, bucket=False)
        r1 = semantic_meshes.render.triangles(mesh, bucket=True)
        assert r1.getPrimitivesNum() == r0.getPrimitivesNum() == 108
        assert r1.faces.shape[0] == 1024  # actually padded
        for cam in cams:
            i0, d0 = r0.render(cam)
            i1, d1 = r1.render(cam)
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
            np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_triangles_clip_near_bit_identical(self, scene):
        mesh, cams = scene
        r0 = semantic_meshes.render.triangles(mesh, clip_near=True,
                                              bucket=False)
        r1 = semantic_meshes.render.triangles(mesh, clip_near=True,
                                              bucket=True)
        i0, d0 = r0.render(cams[0])
        i1, d1 = r1.render(cams[0])
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    def test_texels_bit_identical(self, scene):
        mesh, cams = scene
        r0 = semantic_meshes.render.texels(mesh, cams, 1.5, bucket=False)
        r1 = semantic_meshes.render.texels(mesh, cams, 1.5, bucket=True)
        assert r1.getPrimitivesNum() == r0.getPrimitivesNum()
        np.testing.assert_array_equal(
            np.asarray(r0.resolutions),
            np.asarray(r1.resolutions)[: r0.resolutions.shape[0]],
        )
        # padded triangles contribute zero texels
        assert (np.asarray(r1.resolutions)[r0.resolutions.shape[0]:] == 0).all()
        for cam in cams:
            i0, _ = r0.render(cam)
            i1, _ = r1.render(cam)
            np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    def test_env_default(self, scene, monkeypatch):
        mesh, cams = scene
        monkeypatch.setenv("SM_FACE_BUCKETS", "1")
        r = semantic_meshes.render.triangles(mesh)
        assert r.faces.shape[0] == 1024
        monkeypatch.setenv("SM_FACE_BUCKETS", "0")
        r = semantic_meshes.render.triangles(mesh)
        assert r.faces.shape[0] == 108

    def test_render_many_bucketed(self, scene):
        mesh, cams = scene
        r0 = semantic_meshes.render.triangles(mesh, bucket=False)
        r1 = semantic_meshes.render.triangles(mesh, bucket=True)
        i0, d0 = r0.render_many(cams)
        i1, d1 = r1.render_many(cams)
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


class TestCameraCountBucketing:
    def test_resolutions_unchanged_by_dummy_cameras(self, scene):
        """Padding the camera set with resolution-(0,0) dummies must not
        change any triangle's texel resolution (dummies contribute zero
        area under both sizing rules)."""
        mesh, cams = scene
        r0 = semantic_meshes.render.texels(mesh, cams, 1.5, bucket=False)
        r1 = semantic_meshes.render.texels(mesh, cams, 1.5, bucket=True)
        n = r0.resolutions.shape[0]
        np.testing.assert_array_equal(
            np.asarray(r0.resolutions), np.asarray(r1.resolutions)[:n]
        )
        assert r0.getPrimitivesNum() == r1.getPrimitivesNum()

    def test_resolutions_unchanged_clip_near(self, scene):
        mesh, cams = scene
        r0 = semantic_meshes.render.texels(mesh, cams, 1.5, bucket=False,
                                           clip_near=True)
        r1 = semantic_meshes.render.texels(mesh, cams, 1.5, bucket=True,
                                           clip_near=True)
        n = r0.resolutions.shape[0]
        np.testing.assert_array_equal(
            np.asarray(r0.resolutions), np.asarray(r1.resolutions)[:n]
        )

    def test_setup_program_shared_across_camera_counts(self, scene):
        from semantic_meshes.render import _texel_resolutions_jit
        from semantic_meshes import testing as sm_testing

        mesh, _ = scene
        _texel_resolutions_jit._clear_cache()
        for n in (3, 5, 9):
            cams = sm_testing.make_ring_cameras(num_views=n, width=128,
                                                height=96)
            semantic_meshes.render.texels(mesh, cams, 1.5, bucket=True)
        assert _texel_resolutions_jit._cache_size() == 1
