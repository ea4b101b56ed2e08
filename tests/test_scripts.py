"""End-to-end subprocess tests of the user-facing scripts."""

import os
import subprocess
import sys

import numpy as np
import pytest

import semantic_meshes
from semantic_meshes import testing
from semantic_meshes.io import colmap as cio
from semantic_meshes.io.ply import read_ply, write_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rot_to_quat(m):
    w = np.sqrt(max(0, 1 + m[0, 0] + m[1, 1] + m[2, 2])) / 2
    if w < 1e-6:
        i = int(np.argmax(np.diagonal(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 0.0)) * 2
        q = np.empty(4)
        q[0] = (m[k, j] - m[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (m[j, i] + m[i, j]) / s
        q[1 + k] = (m[k, i] + m[i, k]) / s
        return q
    return np.array(
        [w, (m[2, 1] - m[1, 2]) / (4 * w), (m[0, 2] - m[2, 0]) / (4 * w),
         (m[1, 0] - m[0, 1]) / (4 * w)]
    )


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Cube mesh + COLMAP workspace + per-view 19-class probs + images."""
    root = tmp_path_factory.mktemp("cityscapes_scene")
    W, H, C = 128, 96, 19
    vertices, faces = testing.make_cube(4)
    write_mesh(root / "mesh.ply", vertices, faces)
    cams = testing.make_ring_cameras(num_views=3, width=W, height=H)

    ws = root / "ws"
    os.makedirs(ws)
    cameras = {
        1: cio.ColmapCamera(
            1, "PINHOLE", W, H, np.array([0.9 * H, 0.9 * H]),
            np.array([W / 2, H / 2]),
        )
    }
    images = {}
    for i, c in enumerate(cams, 1):
        images[i] = cio.ColmapImage(
            i, _rot_to_quat(np.asarray(c.rotation, np.float64)),
            np.asarray(c.translation, np.float64), 1, f"v{i}.png",
        )
    cio.write_cameras_txt(ws / "cameras.txt", cameras)
    cio.write_images_txt(ws / "images.txt", images)

    mesh = semantic_meshes.data.Ply(str(root / "mesh.ply"))
    renderer = semantic_meshes.render.triangles(mesh)
    T = renderer.getPrimitivesNum()
    tri_class = (np.arange(T) * 7) % C  # known class per triangle

    import imageio.v2 as imageio

    imgdir = root / "images"
    probsdir = root / "probs"
    os.makedirs(imgdir)
    os.makedirs(probsdir)
    workspace = semantic_meshes.data.Colmap(str(ws))
    for i in range(1, 4):
        cam = workspace.getCamera(f"v{i}.png")
        idx, _ = renderer.render(cam)
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        probs = np.zeros((H, W, C), np.float32)
        ys, xs = np.nonzero(cov)
        probs[ys, xs, tri_class[idx_hw[cov].astype(np.int64)]] = 1.0
        np.save(probsdir / f"v{i}.npy", probs)
        img = np.zeros((H, W, 3), np.uint8)
        img[cov] = 120
        imageio.imwrite(imgdir / f"v{i}.png", img)
    return root, tri_class


@pytest.mark.parametrize("probs_dtype", ["f16", "u8", "topk2"])
def test_colorize_cityscapes_mesh_probs_backend(scene, tmp_path, probs_dtype):
    # f16 is the default wire dtype (lossless here: fixture probs are
    # one-hot); u8 quantizes to p*255 — also exact for one-hot maps — and
    # topk2 keeps the 2 most-probable classes (a one-hot map's argmax is
    # always retained), so the palette assertions below stay bit-exact
    # for all three
    root, tri_class = scene
    probs_dir = root / "probs"
    if probs_dtype.startswith("topk"):
        from semantic_meshes import probs_io

        k = int(probs_dtype[4:])
        probs_dir = tmp_path / "probs_topk"
        os.makedirs(probs_dir)
        for f in os.listdir(root / "probs"):
            probs = np.load(root / "probs" / f)
            part = np.argpartition(probs, -k, axis=-1)[..., -k:]
            vals = np.take_along_axis(probs, part, axis=-1)
            order = np.argsort(-vals, axis=-1)
            idx = np.take_along_axis(part, order, -1).astype(np.uint8)
            np.savez(probs_dir / (os.path.splitext(f)[0] + ".npz"),
                     values=probs_io.quantize_u8(
                         np.take_along_axis(vals, order, -1)),
                     indices=idx, classes=np.int32(probs.shape[-1]))
        probs_dtype = "f16"  # wire arg is ignored for .npz stores
    out = tmp_path / "colorized.ply"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "colorize_cityscapes_mesh.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--images", str(root / "images"),
            "--output_ply", str(out),
            "--probs", str(probs_dir),
            "--probs_dtype", probs_dtype,
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    # verify colors: seen faces must get exactly their class's Cityscapes
    # palette color, unseen faces black (palette per
    # scripts/colorize_cityscapes_mesh.py; importing the script would run
    # its argparse, so the constant is duplicated here)
    CLASS_TO_COLOR = np.asarray(
        [
            (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
            (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
            (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
            (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
            (0, 0, 230), (119, 11, 32),
        ],
        dtype=np.uint8,
    )

    e = read_ply(str(out))
    cols = np.stack(
        [e["face"].data["red"], e["face"].data["green"],
         e["face"].data["blue"]], -1,
    )
    colored = cols.any(-1)
    assert colored.sum() > len(cols) * 0.5
    expected = CLASS_TO_COLOR[tri_class]
    np.testing.assert_array_equal(cols[colored], expected[colored])


@pytest.mark.parametrize("chunk", [1, 2])
def test_colorize_cityscapes_mesh_chunked(scene, tmp_path, chunk):
    """--chunk legs: 1 = the per-view render+add path, 2 = the fused
    render+fuse scan with a RAGGED tail (3 views in chunks of 2 pads the
    last chunk with a zero-prob view, which must contribute nothing —
    zero probs fail the don't-care test, ref: fusion/Mesh.h:98). Both
    must produce the exact palette colors of the default path."""
    root, tri_class = scene
    out = tmp_path / f"colorized_chunk{chunk}.ply"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "colorize_cityscapes_mesh.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--images", str(root / "images"),
            "--output_ply", str(out),
            "--probs", str(root / "probs"),
            "--chunk", str(chunk),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    CLASS_TO_COLOR = np.asarray(
        [
            (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
            (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
            (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
            (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
            (0, 0, 230), (119, 11, 32),
        ],
        dtype=np.uint8,
    )
    e = read_ply(str(out))
    cols = np.stack(
        [e["face"].data["red"], e["face"].data["green"],
         e["face"].data["blue"]], -1,
    )
    colored = cols.any(-1)
    assert colored.sum() > len(cols) * 0.5
    expected = CLASS_TO_COLOR[tri_class]
    np.testing.assert_array_equal(cols[colored], expected[colored])


@pytest.mark.parametrize(
    "cam_model,dist_wire",
    [
        ("SIMPLE_RADIAL", np.array([0.08, 0, 0, 0])),
        ("OPENCV_FISHEYE",
         np.array([0.03, -0.011, 0.002, -0.0005, 0, 0, 0, 0, 1.0])),
        ("THIN_PRISM_FISHEYE",
         np.array([0.03, -0.011, 0.002, -0.0015, 0.0008, -0.0002,
                   0.001, -0.0007, 3.0])),
    ],
    ids=["simple_radial", "opencv_fisheye", "thin_prism_fisheye"],
)
def test_colorize_cityscapes_mesh_chunked_distorted(tmp_path, cam_model,
                                                    dist_wire):
    """A distorted workspace (SIMPLE_RADIAL = COLMAP's DEFAULT model;
    OPENCV_FISHEYE = the extended 9-wide lens wire) through the CHUNKED
    fused scan: round 4 hard-exited on --chunk > 1 with distorted cameras;
    the fused pipeline now carries the virtual-pinhole + resample path, so
    the chunked demo must reproduce the exact per-face palette colors end
    to end."""
    root = tmp_path / "radial_scene"
    W, H, C = 128, 96, 19
    vertices, faces = testing.make_cube(4)
    os.makedirs(root)
    write_mesh(root / "mesh.ply", vertices, faces)
    cams = testing.make_ring_cameras(num_views=3, width=W, height=H)

    ws = root / "ws"
    os.makedirs(ws)
    cameras = {
        1: cio.ColmapCamera(
            1, cam_model, W, H, np.array([0.9 * H, 0.9 * H]),
            np.array([W / 2, H / 2]), dist_wire,
        )
    }
    images = {}
    for i, c in enumerate(cams, 1):
        images[i] = cio.ColmapImage(
            i, _rot_to_quat(np.asarray(c.rotation, np.float64)),
            np.asarray(c.translation, np.float64), 1, f"v{i}.png",
        )
    cio.write_cameras_txt(ws / "cameras.txt", cameras)
    cio.write_images_txt(ws / "images.txt", images)

    mesh = semantic_meshes.data.Ply(str(root / "mesh.ply"))
    renderer = semantic_meshes.render.triangles(mesh)
    T = renderer.getPrimitivesNum()
    tri_class = (np.arange(T) * 7) % C

    import imageio.v2 as imageio

    imgdir = root / "images"
    probsdir = root / "probs"
    os.makedirs(imgdir)
    os.makedirs(probsdir)
    workspace = semantic_meshes.data.Colmap(str(ws))
    for i in range(1, 4):
        cam = workspace.getCamera(f"v{i}.png")
        assert np.any(np.asarray(cam.distortion))  # really distorted
        idx, _ = renderer.render(cam)
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        probs = np.zeros((H, W, C), np.float32)
        ys, xs = np.nonzero(cov)
        probs[ys, xs, tri_class[idx_hw[cov].astype(np.int64)]] = 1.0
        np.save(probsdir / f"v{i}.npy", probs)
        img = np.zeros((H, W, 3), np.uint8)
        img[cov] = 120
        imageio.imwrite(imgdir / f"v{i}.png", img)

    out = tmp_path / "colorized_radial.ply"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "colorize_cityscapes_mesh.py"),
            "--colmap", str(ws),
            "--input_ply", str(root / "mesh.ply"),
            "--images", str(imgdir),
            "--output_ply", str(out),
            "--probs", str(probsdir),
            "--chunk", "2",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    CLASS_TO_COLOR = np.asarray(
        [
            (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
            (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
            (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
            (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100), (0, 80, 100),
            (0, 0, 230), (119, 11, 32),
        ],
        dtype=np.uint8,
    )
    e = read_ply(str(out))
    cols = np.stack(
        [e["face"].data["red"], e["face"].data["green"],
         e["face"].data["blue"]], -1,
    )
    colored = cols.any(-1)
    assert colored.sum() > len(cols) * 0.4
    expected = CLASS_TO_COLOR[tri_class]
    np.testing.assert_array_equal(cols[colored], expected[colored])


def test_colorize_cityscapes_mesh_jax_sliding(scene, tmp_path):
    """--model jax-unet with --sliding/--multi_scale: the reference demo's
    tfcv.predict.sliding((713,713), 0.2) + multi_scale([0.5]) semantics
    on the bundled jax model (ref: colorize_cityscapes_mesh.py:42-43).
    Random weights — asserts the pipeline runs and writes a valid PLY."""
    root, _ = scene
    out = tmp_path / "colorized_sliding.ply"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "colorize_cityscapes_mesh.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--images", str(root / "images"),
            "--output_ply", str(out),
            "--model", "jax-unet",
            "--input_hw", "32", "32",
            "--widths", "8", "16",
            "--sliding", "32", "32",
            "--sliding_overlap", "0.2",
            "--multi_scale", "0.75", "1.0",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    e = read_ply(str(out))
    assert "red" in e["face"].data


def test_colorize_mesh_remap_backend(scene, tmp_path):
    """colorize_mesh.py --remap: color masks -> discovered class ids ->
    colorized PLY reusing the discovered palette."""
    root, tri_class = scene
    import imageio.v2 as imageio

    # build color masks from the probs fixtures: class -> a distinct color
    C = 19
    palette = np.stack(
        [np.arange(C) * 13 % 256, np.arange(C) * 29 % 256,
         np.arange(C) * 53 % 256], -1,
    ).astype(np.uint8)
    palette[0] = [7, 7, 7]  # avoid all-zero (background) collision
    masks = tmp_path / "masks"
    os.makedirs(masks)
    for i in range(1, 4):
        probs = np.load(root / "probs" / f"v{i}.npy")
        cls = probs.argmax(-1)
        covered = probs.sum(-1) > 0.5
        img = np.zeros(cls.shape + (3,), np.uint8)
        img[covered] = palette[cls[covered]]
        imageio.imwrite(masks / f"v{i}.png", img)

    out = tmp_path / "remap.ply"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "colorize_mesh.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--masks", str(masks),
            "--classes", "24",  # >= number of discovered colors
            "--output_ply", str(out),
            "--remap",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "distinct mask colors" in proc.stdout

    e = read_ply(str(out))
    cols = np.stack(
        [e["face"].data["red"], e["face"].data["green"],
         e["face"].data["blue"]], -1,
    )
    colored = cols.any(-1)
    assert colored.sum() > len(cols) * 0.5
    # every output color must be one of the mask palette colors (+ black
    # background color discovered from uncovered pixels)
    valid_colors = {tuple(c) for c in palette} | {(0, 0, 0)}
    got_colors = {tuple(c) for c in np.unique(cols[colored], axis=0)}
    assert got_colors <= valid_colors, got_colors - valid_colors


def test_colorize_cityscapes_mesh_tfcv_stub(scene, tmp_path):
    """--model tfcv plumbing in the flagship script, driven end-to-end
    against the numpy tfcv/tensorflow stubs (tests/_tfcv_stub). Asserts
    the pipeline completes and writes a valid colorized PLY."""
    root, tri_class = scene
    out = tmp_path / "colorized_tfcv.ply"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    stub = os.path.join(REPO, "tests", "_tfcv_stub")
    env["PYTHONPATH"] = stub + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "colorize_cityscapes_mesh.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--images", str(root / "images"),
            "--output_ply", str(out),
            "--model", "tfcv",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    e = read_ply(str(out))
    cols = np.stack(
        [e["face"].data["red"], e["face"].data["green"],
         e["face"].data["blue"]], -1,
    )
    assert len(cols) == len(tri_class)
    assert cols.any()  # the stub predictor colored visible faces


def test_render_annotations_consistent_views(scene, tmp_path):
    """render_annotations.py: fuse label masks, re-render per-view
    annotation images (the paper's consistent-2D-annotations output mode,
    ref: eval-scannet/eval_scannet.py:300-316). Asserts (a) each rendered
    label equals the triangle's known class at every covered pixel in
    EVERY view — multi-view consistency by construction — and (b) the
    --fused_npz reuse path reproduces the images without masks."""
    root, tri_class = scene
    import imageio.v2 as imageio

    import semantic_meshes

    # label masks straight from the known per-triangle classes
    masks = tmp_path / "masks"
    os.makedirs(masks)
    mesh = semantic_meshes.data.Ply(str(root / "mesh.ply"))
    workspace = semantic_meshes.data.Colmap(str(root / "ws"))
    renderer = semantic_meshes.render.triangles(mesh)
    covs = {}
    for i in range(1, 4):
        idx, _ = renderer.render(workspace.getCamera(f"v{i}.png"))
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        cls = np.zeros(idx_hw.shape, np.uint8)
        cls[cov] = tri_class[idx_hw[cov].astype(np.int64)]
        covs[i] = (cov, cls)
        imageio.imwrite(masks / f"v{i}.png", cls)

    out = tmp_path / "ann"
    fused_npz = tmp_path / "fused.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "render_annotations.py"),
        "--colmap", str(root / "ws"),
        "--input_ply", str(root / "mesh.ply"),
        "--classes", "19",
        "--masks", str(masks),
        "--output_dir", str(out),
        "--save_fused", str(fused_npz),
    ]
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    from semantic_meshes.utils import class_palette

    palette = class_palette(19)
    for i in range(1, 4):
        cov, cls = covs[i]
        labels = imageio.imread(out / "labels" / f"v{i}.png")
        color = imageio.imread(out / "color" / f"v{i}.png")
        # every view's covered pixels carry the fused (= true) class
        np.testing.assert_array_equal(labels[cov], cls[cov])
        assert (labels[~cov] == 255).all()
        np.testing.assert_array_equal(color[cov], palette[cls[cov]])
        assert not color[~cov].any()

    # reuse path: same images from the saved fused distributions, no masks
    out2 = tmp_path / "ann2"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "render_annotations.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--classes", "19",
            "--fused_npz", str(fused_npz),
            "--output_dir", str(out2),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    for i in range(1, 4):
        a = imageio.imread(out / "labels" / f"v{i}.png")
        b = imageio.imread(out2 / "labels" / f"v{i}.png")
        np.testing.assert_array_equal(a, b)


def test_render_annotations_texels_mode(scene, tmp_path):
    """Texel-mode annotation re-render: the script's --texels_per_pixel leg
    (plus TexelsRenderer.prepare) runs end-to-end and covered pixels carry
    the fused class."""
    root, tri_class = scene
    import imageio.v2 as imageio

    import semantic_meshes

    masks = tmp_path / "masks"
    os.makedirs(masks)
    mesh = semantic_meshes.data.Ply(str(root / "mesh.ply"))
    workspace = semantic_meshes.data.Colmap(str(root / "ws"))
    renderer = semantic_meshes.render.triangles(mesh)
    for i in range(1, 4):
        idx, _ = renderer.render(workspace.getCamera(f"v{i}.png"))
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        cls = np.zeros(idx_hw.shape, np.uint8)
        cls[cov] = tri_class[idx_hw[cov].astype(np.int64)]
        imageio.imwrite(masks / f"v{i}.png", cls)

    out = tmp_path / "ann_tex"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "render_annotations.py"),
            "--colmap", str(root / "ws"),
            "--input_ply", str(root / "mesh.ply"),
            "--classes", "19",
            "--masks", str(masks),
            "--output_dir", str(out),
            "--texels_per_pixel", "0.05",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    hits = total = 0
    for i in range(1, 4):
        idx, _ = renderer.render(workspace.getCamera(f"v{i}.png"))
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        want = np.zeros(idx_hw.shape, np.uint8)
        want[cov] = tri_class[idx_hw[cov].astype(np.int64)]
        labels = imageio.imread(out / "labels" / f"v{i}.png")
        # texel boundaries quantize slightly differently than triangle
        # ids; demand agreement on the overwhelming majority of covered
        # pixels and background everywhere else
        lab_cov = labels != 255
        hits += (labels[cov & lab_cov] == want[cov & lab_cov]).sum()
        total += (cov & lab_cov).sum()
        assert (cov & lab_cov).sum() > 0.9 * cov.sum()
    assert hits / total > 0.99, hits / total


def test_render_annotations_mul_and_nested_names(scene, tmp_path):
    """Code-review round-5 regressions: (a) --aggregator mul must keep
    never-observed primitives don't-care (its untouched log-space rows
    normalize to uniform, which used to slip past the threshold as class
    0); (b) COLMAP workspaces with NESTED image names ('cam0/v1.png')
    must fuse and write nested outputs instead of crashing."""
    root, tri_class = scene
    import imageio.v2 as imageio

    import semantic_meshes

    # nested-name workspace over the same mesh/poses
    ws2 = tmp_path / "ws_nested"
    os.makedirs(ws2)
    src = semantic_meshes.io.colmap
    cams_src = src.read_cameras(str(root / "ws"))
    imgs_src = src.read_images(str(root / "ws"))
    for im in imgs_src.values():
        im.name = "cam0/" + im.name
    src.write_cameras_txt(ws2 / "cameras.txt", cams_src)
    src.write_images_txt(ws2 / "images.txt", imgs_src)

    mesh = semantic_meshes.data.Ply(str(root / "mesh.ply"))
    workspace = semantic_meshes.data.Colmap(str(ws2))
    renderer = semantic_meshes.render.triangles(mesh)
    masks = tmp_path / "masks" / "cam0"
    os.makedirs(masks)
    observed = np.zeros(renderer.getPrimitivesNum(), bool)
    for i in range(1, 4):
        idx, _ = renderer.render(workspace.getCamera(f"cam0/v{i}.png"))
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        observed[idx_hw[cov].astype(np.int64)] = True
        cls = np.zeros(idx_hw.shape, np.uint8)
        cls[cov] = tri_class[idx_hw[cov].astype(np.int64)]
        imageio.imwrite(masks / f"v{i}.png", cls)
    assert not observed.all()  # the cube's far faces are never seen

    out = tmp_path / "ann_mul"
    fused_npz = tmp_path / "fused_mul.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "render_annotations.py"),
            "--colmap", str(ws2),
            "--input_ply", str(root / "mesh.ply"),
            "--classes", "19",
            "--masks", str(tmp_path / "masks"),
            "--output_dir", str(out),
            "--aggregator", "mul",
            "--save_fused", str(fused_npz),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # (a) unobserved primitives stay zero in the saved distributions
    fused = np.load(fused_npz)["fused"]
    assert not fused[~observed].any()
    assert fused[observed].sum(-1).min() > 0.5
    # (b) nested outputs exist and covered pixels carry the right class
    for i in range(1, 4):
        labels = imageio.imread(out / "labels" / "cam0" / f"v{i}.png")
        idx, _ = renderer.render(workspace.getCamera(f"cam0/v{i}.png"))
        idx_hw = np.asarray(idx).T
        cov = idx_hw != 0xFFFFFFFF
        want = tri_class[idx_hw[cov].astype(np.int64)]
        np.testing.assert_array_equal(labels[cov], want)
        assert (labels[~cov] == 255).all()
