import os

import numpy as np
import pytest

from semantic_meshes.io import colmap as colmap_io
from semantic_meshes.io import ply as ply_io


@pytest.fixture
def mesh():
    rng = np.random.default_rng(0)
    vertices = rng.normal(size=(17, 3)).astype(np.float32)
    faces = np.stack(
        [rng.choice(17, size=3, replace=False) for _ in range(23)]
    ).astype(np.int32)
    return vertices, faces


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    @pytest.mark.parametrize("with_colors", [True, False])
    def test_roundtrip(self, tmp_path, mesh, binary, with_colors):
        vertices, faces = mesh
        colors = (
            np.random.default_rng(1).integers(0, 256, (len(faces), 3)).astype(
                np.uint8
            )
            if with_colors
            else None
        )
        path = tmp_path / "m.ply"
        ply_io.write_mesh(path, vertices, faces, colors, binary=binary)
        v2, f2 = ply_io.read_mesh(path)
        np.testing.assert_allclose(v2, vertices, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)
        if with_colors:
            e = ply_io.read_ply(path)["face"]
            got = np.stack(
                [e.data["red"], e.data["green"], e.data["blue"]], axis=-1
            )
            np.testing.assert_array_equal(got, colors)

    def test_double_vertices_cast(self, tmp_path, mesh):
        vertices, faces = mesh
        path = tmp_path / "m.ply"
        # hand-write a PLY with double vertices
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {len(vertices)}\n".encode())
            f.write(b"property double x\nproperty double y\nproperty double z\n")
            f.write(f"element face {len(faces)}\n".encode())
            f.write(b"property list uchar int vertex_indices\nend_header\n")
            f.write(vertices.astype("<f8").tobytes())
            rec = np.empty(len(faces), dtype=[("n", "u1"), ("i", "<i4", (3,))])
            rec["n"] = 3
            rec["i"] = faces
            f.write(rec.tobytes())
        v2, f2 = ply_io.read_mesh(path)
        assert v2.dtype == np.float32
        np.testing.assert_allclose(v2, vertices, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)

    def test_missing_elements_raise(self, tmp_path):
        path = tmp_path / "bad.ply"
        with open(path, "wb") as f:
            f.write(b"ply\nformat ascii 1.0\nelement vertex 0\n")
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
        with pytest.raises(ply_io.PlyError):
            ply_io.read_mesh(path)

    def test_not_ply(self, tmp_path):
        path = tmp_path / "x.ply"
        path.write_bytes(b"not a ply\n")
        with pytest.raises(ply_io.PlyError):
            ply_io.read_ply(path)


def _write_cameras_bin(path, cameras):
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            model_id = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1}[cam.model]
            f.write(struct.pack("<ii", cam.camera_id, model_id))
            f.write(struct.pack("<QQ", cam.width, cam.height))
            if cam.model == "SIMPLE_PINHOLE":
                params = [cam.focal_lengths[0], *cam.principal_point]
            else:
                params = [*cam.focal_lengths, *cam.principal_point]
            f.write(np.asarray(params, "<f8").tobytes())


def _write_images_bin(path, images):
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for img in images.values():
            f.write(struct.pack("<i", img.image_id))
            f.write(np.asarray(img.qvec, "<f8").tobytes())
            f.write(np.asarray(img.tvec, "<f8").tobytes())
            f.write(struct.pack("<i", img.camera_id))
            f.write(img.name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))  # two dummy 2D points
            f.write(np.zeros(2, dtype=[("x", "<f8"), ("y", "<f8"),
                                       ("id", "<i8")]).tobytes())


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.default_rng(7)
    cameras = {
        1: colmap_io.ColmapCamera(1, "PINHOLE", 640, 480,
                                  np.array([525.0, 520.0]),
                                  np.array([320.0, 240.0])),
        2: colmap_io.ColmapCamera(2, "SIMPLE_PINHOLE", 100, 80,
                                  np.array([50.0, 50.0]),
                                  np.array([50.0, 40.0])),
    }
    images = {}
    for i, name in enumerate(["b.png", "a.png", "c.png"], start=1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i] = colmap_io.ColmapImage(
            i, q, rng.normal(size=3), 1 + (i % 2), name
        )
    return tmp_path, cameras, images


class TestColmap:
    def test_bin_roundtrip(self, workspace):
        tmp_path, cameras, images = workspace
        _write_cameras_bin(tmp_path / "cameras.bin", cameras)
        _write_images_bin(tmp_path / "images.bin", images)
        cams2 = colmap_io.read_cameras(str(tmp_path))
        imgs2 = colmap_io.read_images(str(tmp_path))
        assert set(cams2) == set(cameras)
        for cid in cameras:
            np.testing.assert_allclose(
                cams2[cid].focal_lengths, cameras[cid].focal_lengths
            )
            np.testing.assert_allclose(
                cams2[cid].principal_point, cameras[cid].principal_point
            )
            assert (cams2[cid].width, cams2[cid].height) == (
                cameras[cid].width, cameras[cid].height,
            )
        assert set(imgs2) == set(images)
        for iid in images:
            np.testing.assert_allclose(imgs2[iid].qvec, images[iid].qvec)
            np.testing.assert_allclose(imgs2[iid].tvec, images[iid].tvec)
            assert imgs2[iid].name == images[iid].name
            assert imgs2[iid].camera_id == images[iid].camera_id

    def test_txt_roundtrip(self, workspace):
        tmp_path, cameras, images = workspace
        colmap_io.write_cameras_txt(tmp_path / "cameras.txt", cameras)
        colmap_io.write_images_txt(tmp_path / "images.txt", images)
        cams2 = colmap_io.read_cameras(str(tmp_path))
        imgs2 = colmap_io.read_images(str(tmp_path))
        for cid in cameras:
            np.testing.assert_allclose(
                cams2[cid].focal_lengths, cameras[cid].focal_lengths
            )
        for iid in images:
            np.testing.assert_allclose(imgs2[iid].qvec, images[iid].qvec,
                                       atol=1e-12)
            assert imgs2[iid].name == images[iid].name

    def test_simple_pinhole_duplicates_focal(self, workspace):
        tmp_path, cameras, images = workspace
        _write_cameras_bin(tmp_path / "cameras.bin", cameras)
        cams2 = colmap_io.read_cameras(str(tmp_path))
        assert cams2[2].focal_lengths[0] == cams2[2].focal_lengths[1]

    def test_unsupported_model_raises(self, tmp_path):
        import struct

        # every COLMAP model parses natively now (test_distortion.py,
        # test_lens_models.py); ids beyond the zoo still raise typed
        # errors instead of leaking struct/KeyError
        with open(tmp_path / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 11))  # beyond COLMAP's models
            f.write(struct.pack("<QQ", 10, 10))
            f.write(np.zeros(12, "<f8").tobytes())
        with pytest.raises(colmap_io.ColmapError):
            colmap_io.read_cameras(str(tmp_path))

    def test_missing_workspace_raises(self, tmp_path):
        with pytest.raises(colmap_io.ColmapError):
            colmap_io.read_cameras(str(tmp_path))


class TestDataLayer:
    def test_colmap_sorted_by_name_and_lookup(self, workspace):
        tmp_path, cameras, images = workspace
        _write_cameras_bin(tmp_path / "cameras.bin", cameras)
        _write_images_bin(tmp_path / "images.bin", images)
        from semantic_meshes.data import Colmap

        ws = Colmap(str(tmp_path))
        assert ws.getImageNum() == 3
        assert ws.getImageIndex("a.png") == 0
        assert ws.getImageIndex("/some/dir/c.png") == 2
        with pytest.raises(KeyError):
            ws.getImageIndex("missing.png")
        cam = ws.getCamera("a.png")
        cam_by_idx = ws.getCamera(0)
        np.testing.assert_allclose(cam.rotation, cam_by_idx.rotation)
        # rotation is orthonormal
        np.testing.assert_allclose(
            cam.rotation @ cam.rotation.T, np.eye(3), atol=1e-5
        )

    def test_ply_save_shape_check(self, tmp_path, mesh):
        vertices, faces = mesh
        from semantic_meshes.data import Ply
        from semantic_meshes.io.ply import write_mesh

        p = tmp_path / "m.ply"
        write_mesh(p, vertices, faces)
        m = Ply(str(p))
        with pytest.raises(ValueError):
            m.save(tmp_path / "o.ply", np.zeros((5, 3)))
        m.save(tmp_path / "o.ply", np.zeros((len(faces), 3)))
        m2 = Ply(str(tmp_path / "o.ply"))
        np.testing.assert_array_equal(m2.faces, faces)


class TestNativeColmap:
    def test_images_bin_native_matches_python(self, workspace):
        tmp_path, cameras, images = workspace
        _write_images_bin(tmp_path / "images.bin", images)
        import semantic_meshes.native as native
        from semantic_meshes.io.colmap import read_images_bin

        path = str(tmp_path / "images.bin")
        got_native = None
        if native.load() is not None:
            got_native = read_images_bin(path)
        # force the python fallback
        old_lib, old_tried = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            got_py = read_images_bin(path)
        finally:
            native._lib, native._tried = old_lib, old_tried
        if got_native is None:
            pytest.skip("native lib unavailable")
        assert set(got_native) == set(got_py)
        for iid in got_py:
            np.testing.assert_allclose(
                got_native[iid].qvec, got_py[iid].qvec
            )
            assert got_native[iid].name == got_py[iid].name


class TestSensExporters:
    def test_exporters_roundtrip(self, tmp_path):
        import io as _io
        import zlib

        import imageio.v2 as imageio

        from semantic_meshes.data2 import SensFile
        from semantic_meshes.data2.scannet import write_sens

        rng = np.random.default_rng(3)
        H, W = 16, 24
        frames = []
        depths = []
        for i in range(3):
            depth = rng.integers(0, 5000, (H, W)).astype("<u2")
            depths.append(depth)
            color = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
            buf = _io.BytesIO()
            imageio.imwrite(buf, color, format="jpeg")
            frames.append(dict(
                camera_to_world=np.eye(4) + i * 0.125,
                timestamp_color=i, timestamp_depth=i,
                color_data=buf.getvalue(),
                depth_data=zlib.compress(depth.tobytes()),
            ))
        path = tmp_path / "s.sens"
        write_sens(str(path), "x", np.eye(4), np.eye(4), np.eye(4),
                   np.eye(4), (H, W), (H, W), 1000.0, frames)
        s = SensFile(str(path))

        s.export_depth_images(str(tmp_path / "d"))
        s.export_color_images(str(tmp_path / "c"))
        s.export_poses(str(tmp_path / "p"))
        s.export_intrinsics(str(tmp_path / "i"))
        assert sorted(os.listdir(tmp_path / "d")) == ["0.png", "1.png", "2.png"]
        got = imageio.imread(tmp_path / "d" / "1.png")
        np.testing.assert_array_equal(got, depths[1])
        pose = np.loadtxt(tmp_path / "p" / "2.txt")
        np.testing.assert_allclose(pose, np.eye(4) + 2 * 0.125, atol=1e-6)
        assert (tmp_path / "i" / "intrinsic_color.txt").exists()
        # batch depth decode equals per-frame decode
        batch = s.decode_all_depths()
        np.testing.assert_array_equal(batch, np.stack(depths))


class TestCameraPytree:
    def test_camera_traces_through_jit(self):
        import jax
        import jax.numpy as jnp

        from semantic_meshes.data import Camera

        cam = Camera(np.eye(3), np.zeros(3), np.array([64, 48]),
                     np.array([50.0, 50.0]), np.array([32.0, 24.0]))

        @jax.jit
        def f(c):
            return jnp.sum(c.rotation) + jnp.sum(c.translation)

        assert float(f(cam)) == 3.0
        leaves, treedef = jax.tree_util.tree_flatten(cam)
        cam2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert cam2.resolution == cam.resolution
        np.testing.assert_array_equal(
            np.asarray(cam2.rotation), np.asarray(cam.rotation)
        )


class TestPlyBigEndian:
    def test_big_endian_read(self, tmp_path, mesh):
        vertices, faces = mesh
        path = tmp_path / "be.ply"
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_big_endian 1.0\n")
            f.write(f"element vertex {len(vertices)}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(f"element face {len(faces)}\n".encode())
            f.write(b"property list uchar int vertex_indices\nend_header\n")
            f.write(vertices.astype(">f4").tobytes())
            rec = np.empty(len(faces), dtype=[("n", "u1"), ("i", ">i4", (3,))])
            rec["n"] = 3
            rec["i"] = faces
            f.write(rec.tobytes())
        v2, f2 = ply_io.read_mesh(path)
        np.testing.assert_allclose(v2, vertices, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)

    def test_truncated_binary_raises_or_errors(self, tmp_path, mesh):
        vertices, faces = mesh
        good = tmp_path / "good.ply"
        ply_io.write_mesh(good, vertices, faces)
        data = good.read_bytes()
        bad = tmp_path / "bad.ply"
        bad.write_bytes(data[: len(data) // 2])
        with pytest.raises(Exception):
            ply_io.read_mesh(bad)


class TestNativeSensRobustness:
    def test_truncated_sens_raises(self, tmp_path):
        import zlib

        from semantic_meshes.data2 import SensFile
        from semantic_meshes.data2.scannet import write_sens

        frames = [dict(camera_to_world=np.eye(4), timestamp_color=0,
                       timestamp_depth=0, color_data=b"x" * 100,
                       depth_data=zlib.compress(b"\x00" * 200))]
        path = tmp_path / "t.sens"
        write_sens(str(path), "x", np.eye(4), np.eye(4), np.eye(4),
                   np.eye(4), (10, 10), (10, 10), 1000.0, frames)
        data = path.read_bytes()
        bad = tmp_path / "bad.sens"
        bad.write_bytes(data[:-50])  # cut into the last frame payload
        with pytest.raises(Exception):
            SensFile(str(bad))

    def test_wrong_version_raises(self, tmp_path):
        import struct

        from semantic_meshes.data2 import SensFile

        path = tmp_path / "v9.sens"
        path.write_bytes(struct.pack("<I", 9) + b"\x00" * 64)
        with pytest.raises(ValueError):
            SensFile(str(path))

    def _one_frame_sens(self, tmp_path):
        import zlib

        from semantic_meshes.data2.scannet import write_sens

        frames = [dict(camera_to_world=np.eye(4), timestamp_color=0,
                       timestamp_depth=0, color_data=b"x" * 100,
                       depth_data=zlib.compress(b"\x00" * 200))]
        path = tmp_path / "w.sens"
        write_sens(str(path), "x", np.eye(4), np.eye(4), np.eye(4),
                   np.eye(4), (10, 10), (10, 10), 1000.0, frames)
        return path

    def test_wrapping_color_size_rejected(self, tmp_path):
        """A color_size near UINT64_MAX must be a parse error, not a
        uint64 wraparound that leaves out-of-range payload offsets for the
        zlib batch decoder (OOB read)."""
        from semantic_meshes import native

        if native.load() is None:
            pytest.skip("native sens_io unavailable")
        path = self._one_frame_sens(tmp_path)
        data = bytearray(path.read_bytes())
        hdr = native.parse_header(bytes(data))
        # frame record: 64B pose + 8 ts_color + 8 ts_depth, then color_size
        off = int(hdr.frames_start) + 64 + 16
        data[off:off + 8] = b"\xff" * 8
        with pytest.raises(ValueError):
            native.index_frames(bytes(data), int(hdr.frames_start), 1)

    def test_huge_num_frames_rejected(self, tmp_path):
        """A corrupt num_frames must raise, not allocate multi-GB records."""
        from semantic_meshes import native

        if native.load() is None:
            pytest.skip("native sens_io unavailable")
        path = self._one_frame_sens(tmp_path)
        data = path.read_bytes()
        hdr = native.parse_header(data)
        with pytest.raises(ValueError):
            native.index_frames(data, int(hdr.frames_start), 2**40)

    def test_decode_depth_oob_spans_rejected(self, tmp_path):
        from semantic_meshes import native

        if native.load() is None:
            pytest.skip("native sens_io unavailable")
        data = b"\x00" * 64
        with pytest.raises(ValueError):
            native.decode_depth_batch(
                data, np.array([2**63], np.uint64),
                np.array([100], np.uint64), 100,
            )
        with pytest.raises(ValueError):
            native.decode_depth_batch(
                data, np.array([32], np.uint64),
                np.array([64], np.uint64), 100,  # 32 + 64 > 64
            )


class TestNativeColmapRobustness:
    def test_huge_image_count_rejected(self):
        from semantic_meshes import native

        if native.load() is None or not hasattr(
            native.load(), "colmap_index_images"
        ):
            pytest.skip("native colmap indexer unavailable")
        data = np.uint64(2**40).tobytes() + b"\x00" * 80
        with pytest.raises(ValueError):
            native.index_colmap_images(data)

    def test_wrapping_npoints_rejected(self):
        import struct

        from semantic_meshes import native

        if native.load() is None or not hasattr(
            native.load(), "colmap_index_images"
        ):
            pytest.skip("native colmap indexer unavailable")
        rec = (
            struct.pack("<i", 1)              # image_id
            + struct.pack("<4d", 1, 0, 0, 0)  # qvec
            + struct.pack("<3d", 0, 0, 0)     # tvec
            + struct.pack("<i", 1)            # camera_id
            + b"img.png\x00"
            + struct.pack("<Q", 2**61)        # npoints: wraps *24
        )
        data = struct.pack("<Q", 1) + rec
        with pytest.raises(ValueError):
            native.index_colmap_images(data)


class _Mutator:
    """Deterministic byte-level mutations shared by the codec fuzz tests.

    Every parser must either succeed or raise its typed error
    (PlyError / ColmapError / SensError — all ValueError subclasses) on ANY
    input; raw IndexError / KeyError / struct.error / MemoryError leaking
    from numpy or struct mean a missing validation (each class of leak
    below was actually found by this fuzz before being fixed)."""

    def __init__(self, seed_bytes, rng):
        self.seed = seed_bytes
        self.rng = rng

    def case(self):
        rng = self.rng
        data = bytearray(self.seed)
        op = rng.integers(0, 4)
        if op == 0 and len(data):  # flip random bytes
            for _ in range(int(rng.integers(1, 8))):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        elif op == 1:  # truncate
            data = data[: rng.integers(0, len(data) + 1)]
        elif op == 2:  # append junk
            data += bytes(
                rng.integers(0, 256, size=int(rng.integers(1, 64)),
                             dtype=np.uint8)
            )
        elif len(data) > 8:  # splice-shuffle a segment
            a, b = sorted(rng.integers(0, len(data), 2))
            seg = data[a:b]
            del data[a:b]
            c = rng.integers(0, len(data) + 1)
            data[c:c] = seg
        return bytes(data)


def _fuzz(parse, seed_bytes, n, allowed, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    mut = _Mutator(seed_bytes, rng)
    fails = []
    for i in range(n):
        data = mut.case()
        try:
            parse(data)
        except allowed:
            pass
        except Exception as e:  # noqa: BLE001 - the assertion target
            fails.append((i, type(e).__name__, str(e)[:80]))
    assert not fails, fails[:10]


class TestPlyFuzz:
    N = 150

    def _seed(self, tmp_path, binary):
        verts = np.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        p = tmp_path / "seed.ply"
        ply_io.write_mesh(str(p), verts, faces, binary=binary)
        return p.read_bytes()

    @pytest.mark.parametrize("binary", [True, False])
    def test_mutations_raise_typed_errors(self, tmp_path, binary):
        seed = self._seed(tmp_path, binary)
        target = tmp_path / "fz.ply"

        def parse(data):
            target.write_bytes(data)
            ply_io.read_ply(str(target))

        # PlyError ONLY: a bare ValueError here means an un-wrapped
        # numpy/builtin error escaped the typed-error net
        _fuzz(parse, seed, self.N, (ply_io.PlyError,),
              rng_seed=1 if binary else 2)


class TestColmapFuzz:
    """read_cameras/read_images take a WORKSPACE DIRECTORY — each target
    writes the mutated bytes as <stem>.<ext> inside its own directory so
    the mutation actually reaches the bin/txt parser (an earlier version
    passed the file path itself, which _find rejected before parsing a
    single byte, making the fuzz vacuous). A sanity call on the unmutated
    seed pins that the parser really runs."""

    N = 150

    def _run(self, tmp_path, filename, reader, seed, rng_seed):
        ws = tmp_path / "ws"
        ws.mkdir()
        target = ws / filename

        def parse(data):
            target.write_bytes(data)
            reader(str(ws))

        parse(seed)  # the unmutated seed must parse (fuzz is non-vacuous)
        # ColmapError ONLY (see TestPlyFuzz note)
        _fuzz(parse, seed, self.N,
              (colmap_io.ColmapError,), rng_seed=rng_seed)

    def test_cameras_bin_mutations(self, tmp_path):
        import struct

        seed = (
            struct.pack("<Q", 1)
            + struct.pack("<ii", 1, 1)
            + struct.pack("<QQ", 64, 48)
            + struct.pack("<4d", 60.0, 60.0, 32.0, 24.0)
        )
        self._run(tmp_path, "cameras.bin", colmap_io.read_cameras, seed, 3)

    def test_images_bin_mutations(self, tmp_path):
        import struct

        seed = (
            struct.pack("<Q", 1)
            + struct.pack("<i", 1)
            + struct.pack("<4d", 1, 0, 0, 0)
            + struct.pack("<3d", 0, 0, 0)
            + struct.pack("<i", 1)
            + b"img0.png\x00"
            + struct.pack("<Q", 0)
        )
        self._run(tmp_path, "images.bin", colmap_io.read_images, seed, 4)

    def test_cameras_txt_mutations(self, tmp_path):
        seed = (
            b"# Camera list\n"
            b"1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n"
            b"2 SIMPLE_PINHOLE 64 48 60.0 32.0 24.0\n"
        )
        self._run(tmp_path, "cameras.txt", colmap_io.read_cameras, seed, 7)

    def test_images_txt_mutations(self, tmp_path):
        seed = (
            b"# Image list\n"
            b"1 1 0 0 0 0 0 1 1 img0.png\n"
            b"0 0 1 2\n"
            b"2 1 0 0 0 0 0 1 1 img1.png\n"
            b"\n"
        )
        self._run(tmp_path, "images.txt", colmap_io.read_images, seed, 8)


class TestSensFuzz:
    N = 150

    def _seed(self, tmp_path):
        import zlib

        from semantic_meshes.data2 import scannet

        eye = np.eye(4, dtype=np.float32)
        frames = []
        for i in range(2):
            depth = zlib.compress(
                np.full((8 * 6,), 1000, np.uint16).tobytes()
            )
            frames.append(dict(
                camera_to_world=eye, timestamp_color=i, timestamp_depth=i,
                color_data=b"\xff\xd8fakejpeg\xff\xd9", depth_data=depth,
            ))
        p = tmp_path / "seed.sens"
        scannet.write_sens(
            str(p), "sensor", eye, eye, eye, eye, (6, 8), (6, 8), 1000.0,
            frames,
        )
        return p.read_bytes()

    @pytest.mark.parametrize("use_native", [True, False])
    def test_mutations_raise_typed_errors(self, tmp_path, use_native):
        from semantic_meshes.data2 import scannet

        seed = self._seed(tmp_path)
        target = tmp_path / "fz.sens"

        def parse(data):
            target.write_bytes(data)
            if use_native:
                scannet.SensFile(str(target))
            else:
                orig = scannet.SensFile._try_native
                scannet.SensFile._try_native = lambda self, fn, mf: False
                try:
                    scannet.SensFile(str(target))
                finally:
                    scannet.SensFile._try_native = orig

        # SensError ONLY (see TestPlyFuzz note); NotImplementedError is
        # the documented unsupported-compression signal
        _fuzz(parse, seed, self.N,
              (scannet.SensError, NotImplementedError),
              rng_seed=5 if use_native else 6)
