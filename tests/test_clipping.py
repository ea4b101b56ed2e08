"""Near-plane clipping (opt-in): partial rendering of triangles crossing
z = znear, correct depths, deterministic id mapping, backend agreement."""

import numpy as np
import pytest

from semantic_meshes import geometry, testing
from semantic_meshes.io.ply import write_mesh
from semantic_meshes.rasterize import dense, pallas_kernel, xla

CAM = (
    np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
    np.array([40.0, 40.0], np.float32), np.array([64.0, 32.0], np.float32),
)
H, W = 64, 128


class TestClipTrianglesNear:
    def test_fully_in_front(self):
        cam = np.array([[[0, 0, 1], [1, 0, 2], [0, 1, 3]]], np.float32)
        pieces, valid = geometry.clip_triangles_near(cam, 1e-4)
        assert valid[0, 0] and not valid[0, 1]
        np.testing.assert_allclose(np.asarray(pieces)[0, 0], cam[0])

    def test_fully_behind(self):
        cam = np.array([[[0, 0, -1], [1, 0, -2], [0, 1, -3]]], np.float32)
        _, valid = geometry.clip_triangles_near(cam, 1e-4)
        assert not valid.any()

    def test_one_vertex_in_front(self):
        znear = 0.5
        cam = np.array([[[0, 0, 2], [4, 0, -1], [0, 4, -1]]], np.float32)
        pieces, valid = geometry.clip_triangles_near(cam, znear)
        assert valid[0, 0] and not valid[0, 1]
        p = np.asarray(pieces)[0, 0]
        np.testing.assert_allclose(p[:, 2].min(), znear, atol=1e-6)
        # intersections at t = (0.5-2)/(-1-2) = 0.5 along both edges
        np.testing.assert_allclose(p[1], [2, 0, znear], atol=1e-5)
        np.testing.assert_allclose(p[2], [0, 2, znear], atol=1e-5)

    def test_two_vertices_in_front_gives_quad(self):
        znear = 0.5
        cam = np.array([[[0, 0, 2], [4, 0, 2], [0, 4, -1]]], np.float32)
        pieces, valid = geometry.clip_triangles_near(cam, znear)
        assert valid[0].all()
        p = np.asarray(pieces)[0]
        assert (p[:, :, 2] >= znear - 1e-6).all()
        # union area of the two pieces equals the clipped quad's area:
        # original area in the plane z>=0.5 region
        def area3d(tri):
            return 0.5 * np.linalg.norm(
                np.cross(tri[1] - tri[0], tri[2] - tri[0])
            )
        # full triangle area = 0.5*|(4,0,0)x(0,4,-3)| ... compute clipped
        # fraction analytically: cut at t=0.5 along both edges toward C:
        # removed corner is similar triangle with factor 0.5 -> area/4
        full = area3d(cam[0])
        clipped = area3d(p[0]) + area3d(p[1])
        np.testing.assert_allclose(clipped, full * 0.75, rtol=1e-5)


class TestClippedRasterization:
    def test_crossing_triangle_partially_rendered(self):
        # a "floor" below the camera extending from behind (z=-2) to far
        # ahead (z=10): its in-front part fills the lower image half
        vertices = np.array(
            [[-5, 0.8, -2], [5, 0.8, -2], [0, 0.8, 10]], np.float32
        )
        faces = np.array([[0, 1, 2]], np.int32)
        for mod in (xla, pallas_kernel, dense):
            tri, depth, _ = mod.rasterize(
                vertices, faces, *CAM, height=H, width=W, clip_near=True
            )
            tri = np.asarray(tri)
            assert (tri == 0).any(), mod.__name__  # in-front part rendered
            d = np.asarray(depth)
            assert np.isfinite(d[tri == 0]).all()
            assert (d[tri == 0] > 0).all()
            # verify depth analytically: floor at y=0.8 -> for covered
            # pixel rows, z = f * 0.8 / (py - cy)
            ys, xs = np.nonzero(tri == 0)
            expect = 40.0 * 0.8 / (ys + 0.5 - 32.0)
            # the clipped vertex sits at z=1e-4 (inv_z = 1e4); interpolating
            # that plane in f32 costs ~0.2% at distant pixels
            np.testing.assert_allclose(d[ys, xs], expect, rtol=5e-3)
            # culled render shows nothing
            t2, _, _ = mod.rasterize(
                vertices, faces, *CAM, height=H, width=W
            )
            assert not (np.asarray(t2) == 0).any()

    def test_backends_agree_on_clipped_scene(self):
        rng = np.random.default_rng(8)
        vertices = rng.normal(size=(40, 3)).astype(np.float32) * 2
        # no +z shift: many triangles straddle the camera plane
        faces = rng.integers(0, 40, size=(30, 3)).astype(np.int32)
        outs = []
        for mod in (xla, pallas_kernel, dense):
            tri, depth, _ = mod.rasterize(
                vertices, faces, *CAM, height=H, width=W, clip_near=True
            )
            outs.append((np.asarray(tri), np.asarray(depth)))
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][0], outs[2][0])
        fin = np.isfinite(outs[0][1])
        np.testing.assert_allclose(
            outs[0][1][fin], outs[1][1][fin], rtol=1e-6
        )

    def test_ids_map_to_original_triangles(self):
        rng = np.random.default_rng(9)
        vertices = rng.normal(size=(30, 3)).astype(np.float32) * 2
        faces = rng.integers(0, 30, size=(12, 3)).astype(np.int32)
        tri, _, _ = xla.rasterize(
            vertices, faces, *CAM, height=H, width=W, clip_near=True
        )
        tri = np.asarray(tri)
        assert tri.max() < len(faces)

    def test_clip_matches_cull_when_all_in_front(self):
        vertices, faces = testing.make_cube(4)
        from semantic_meshes.data import stack_cameras

        cams = testing.make_ring_cameras(num_views=1, width=W, height=H)
        rot, trans, fl, pp = stack_cameras(cams)
        a = xla.rasterize(vertices, faces, rot[0], trans[0], fl[0], pp[0],
                          height=H, width=W)
        b = xla.rasterize(vertices, faces, rot[0], trans[0], fl[0], pp[0],
                          height=H, width=W, clip_near=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        fin = np.isfinite(np.asarray(a[1]))
        np.testing.assert_allclose(
            np.asarray(a[1])[fin], np.asarray(b[1])[fin], rtol=1e-5
        )


class TestCameraInsideScene:
    def test_camera_inside_cube_sees_walls(self, tmp_path):
        """The indoor case: a camera INSIDE the cube renders nothing with
        culling (every wall triangle near the camera may cross z=0 at
        grazing configurations) but full walls with clipping."""
        import semantic_meshes

        vertices, faces = testing.make_cube(4, size=4.0)
        write_mesh(tmp_path / "room.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "room.ply"))
        rotation, translation = geometry.look_at(
            [0.0, 0.0, 0.0], [1.0, 0.2, 0.3], [0, 1, 0]
        )
        cam = semantic_meshes.data.Camera(
            rotation, translation, np.array([W, H]),
            np.array([50.0, 50.0]), np.array([W / 2, H / 2]),
        )
        r_cull = semantic_meshes.render.triangles(mesh)
        r_clip = semantic_meshes.render.triangles(mesh, clip_near=True)
        idx_cull, _ = r_cull.render(cam)
        idx_clip, depth_clip = r_clip.render(cam)
        cov_cull = (np.asarray(idx_cull) != 0xFFFFFFFF).mean()
        cov_clip = (np.asarray(idx_clip) != 0xFFFFFFFF).mean()
        # inside a closed box the clipped render must cover ~everything
        assert cov_clip > 0.999, cov_clip
        assert cov_clip >= cov_cull
        d = np.asarray(depth_clip)
        assert np.isfinite(d).all() and (d > 0).all()

    def test_texels_camera_inside_cube(self, tmp_path):
        """Texel mode with clipping: the camera-space affine shader
        (d . (Vj x Vk), valid for behind-camera vertices) plus the
        clipped-piece resolution sizing must give near-full coverage with
        in-range texel ids from inside a closed room."""
        import semantic_meshes

        vertices, faces = testing.make_cube(4, size=4.0)
        write_mesh(tmp_path / "room.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "room.ply"))
        rotation, translation = geometry.look_at(
            [0.0, 0.0, 0.0], [1.0, 0.2, 0.3], [0, 1, 0]
        )
        cam = semantic_meshes.data.Camera(
            rotation, translation, np.array([W, H]),
            np.array([50.0, 50.0]), np.array([W / 2, H / 2]),
        )
        renderer = semantic_meshes.render.texels(
            mesh, [cam], 1.0, clip_near=True
        )
        idx, depth = renderer.render(cam)
        idx = np.asarray(idx)
        cov = (idx != 0xFFFFFFFF).mean()
        assert cov > 0.99, cov
        assert idx[idx != 0xFFFFFFFF].max() < renderer.getPrimitivesNum()
        d = np.asarray(depth)
        assert np.isfinite(d).all() and (d > 0).all()

    def test_texels_clip_matches_noclip_when_in_front(self, tmp_path):
        """On an all-in-front scene the camera-space and projected-vertex
        shader formulations compute the same perspective-correct uv; texel
        ids may differ only on texel-boundary pixels (fp quantization)."""
        import semantic_meshes

        vertices, faces = testing.make_cube(3)
        write_mesh(tmp_path / "c.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "c.ply"))
        cams = testing.make_ring_cameras(num_views=2, width=W, height=H)
        r0 = semantic_meshes.render.texels(mesh, cams, 1.5)
        r1 = semantic_meshes.render.texels(mesh, cams, 1.5, clip_near=True)
        assert r0.getPrimitivesNum() == r1.getPrimitivesNum()
        np.testing.assert_array_equal(
            np.asarray(r0.resolutions), np.asarray(r1.resolutions)
        )
        for cam in cams:
            i0 = np.asarray(r0.render(cam)[0])
            i1 = np.asarray(r1.render(cam)[0])
            np.testing.assert_array_equal(
                i0 == 0xFFFFFFFF, i1 == 0xFFFFFFFF
            )
            agree = (i0 == i1).mean()
            assert agree > 0.99, agree

    def test_fuse_views_clip_matches_sequential(self, tmp_path):
        """distributed.fuse_views(clip_near=True) on a straddling scene ==
        the public renderer + MeshAggregator loop with clip_near=True."""
        import semantic_meshes
        from semantic_meshes import distributed, testing as sm_testing
        from semantic_meshes.data import stack_cameras

        vertices, faces = testing.make_cube(3, size=4.0)
        write_mesh(tmp_path / "room.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "room.ply"))
        rotation, translation = geometry.look_at(
            [0.0, 0.0, 0.0], [1.0, 0.0, 0.2], [0, 1, 0]
        )
        cam = semantic_meshes.data.Camera(
            rotation, translation, np.array([W, H]),
            np.array([50.0, 50.0]), np.array([W / 2, H / 2]),
        )
        renderer = semantic_meshes.render.triangles(mesh, clip_near=True)
        P = renderer.getPrimitivesNum()
        C = 4
        rng = np.random.default_rng(3)
        probs = sm_testing.random_probs(rng, H, W, C)

        agg = semantic_meshes.fusion.MeshAggregator(P, C, aggregator="sum")
        idx, _ = renderer.render(cam)
        assert (np.asarray(idx) != 0xFFFFFFFF).any()
        agg.add(idx, probs.transpose(1, 0, 2))

        rot, trans, fl, pp = stack_cameras([cam])
        acc, _ = distributed.fuse_views(
            renderer.vertices, renderer.faces, rot, trans, fl, pp,
            probs[None], np.float32(0.5),
            num_primitives=P, aggregator="sum", height=H, width=W,
            clip_near=True,
        )
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(agg.state), rtol=2e-5, atol=1e-5
        )

    def test_sharded_clip_matches_single_chip(self, tmp_path):
        """make_sharded_fuse(clip_near=True) on the virtual 8-device mesh
        == single-chip fuse_views_texels(clip_near=True) on an indoor
        (straddling) scene."""
        import jax
        from jax.sharding import Mesh
        import semantic_meshes
        from semantic_meshes import distributed, testing as sm_testing
        from semantic_meshes.data import stack_cameras

        devices = np.array(jax.devices())
        if devices.size < 8:
            pytest.skip("needs 8 devices (virtual cpu mesh)")
        mesh_dev = Mesh(devices[:8].reshape(2, 4), ("views", "pixels"))

        vertices, faces = testing.make_cube(2, size=4.0)
        write_mesh(tmp_path / "room.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "room.ply"))

        def cam_pose(eye, tgt):
            rot, trans = geometry.look_at(eye, tgt, [0, 1, 0])
            return semantic_meshes.data.Camera(
                rot, trans, np.array([W, H]),
                np.array([50.0, 50.0]), np.array([W / 2, H / 2]),
            )

        cams = [cam_pose([1.7, 0.0, 0.0], [1.7, 0.05, 1.0]),
                cam_pose([0.0, -1.6, 0.0], [0.3, -1.55, 1.0])]
        renderer = semantic_meshes.render.texels(
            mesh, cams, 1.0, clip_near=True
        )
        P = renderer.getPrimitivesNum()
        rng = np.random.default_rng(7)
        probs = np.stack(
            [sm_testing.random_probs(rng, H, W, 3) for _ in cams]
        )
        rot, trans, fl, pp = stack_cameras(cams)
        ref = np.asarray(distributed.fuse_views_texels(
            renderer.vertices, renderer.faces, renderer.resolutions,
            renderer.first_texel_index, rot, trans, fl, pp, probs,
            np.float32(0.5), num_primitives=P, aggregator="sum",
            height=H, width=W, clip_near=True,
        )[0])
        fuse = distributed.make_sharded_fuse(
            mesh_dev, num_primitives=P, aggregator="sum",
            height=H, width=W,
            texel_params=(renderer.resolutions,
                          renderer.first_texel_index),
            clip_near=True,
        )
        with mesh_dev:
            got = np.asarray(fuse(
                renderer.vertices, renderer.faces, rot, trans, fl, pp,
                probs, np.float32(0.5),
            )[0])
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    def test_fuse_views_texels_clip_matches_sequential(self, tmp_path):
        import semantic_meshes
        from semantic_meshes import distributed, testing as sm_testing
        from semantic_meshes.data import stack_cameras

        vertices, faces = testing.make_cube(2, size=4.0)
        write_mesh(tmp_path / "room.ply", vertices, faces)
        mesh = semantic_meshes.data.Ply(str(tmp_path / "room.ply"))
        rotation, translation = geometry.look_at(
            [0.0, 0.0, 0.0], [0.3, 0.1, 1.0], [0, 1, 0]
        )
        cam = semantic_meshes.data.Camera(
            rotation, translation, np.array([W, H]),
            np.array([50.0, 50.0]), np.array([W / 2, H / 2]),
        )
        renderer = semantic_meshes.render.texels(
            mesh, [cam], 1.0, clip_near=True
        )
        P = renderer.getPrimitivesNum()
        C = 3
        rng = np.random.default_rng(4)
        probs = sm_testing.random_probs(rng, H, W, C)

        agg = semantic_meshes.fusion.MeshAggregator(P, C, aggregator="sum")
        idx, _ = renderer.render(cam)
        assert (np.asarray(idx) != 0xFFFFFFFF).any()
        agg.add(idx, probs.transpose(1, 0, 2))

        rot, trans, fl, pp = stack_cameras([cam])
        acc, _ = distributed.fuse_views_texels(
            renderer.vertices, renderer.faces, renderer.resolutions,
            renderer.first_texel_index, rot, trans, fl, pp,
            probs[None], np.float32(0.5),
            num_primitives=P, aggregator="sum", height=H, width=W,
            clip_near=True,
        )
        np.testing.assert_allclose(
            np.asarray(acc), np.asarray(agg.state), rtol=2e-5, atol=1e-5
        )
