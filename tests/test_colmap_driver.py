"""run_colmap_on_scannet.py end-to-end against a stub `colmap` binary.

The real COLMAP binary is not in this image; a python stub implements just
enough of each subcommand (database with an images table, output files) to
drive the known-pose workflow: frame export, cameras/images.txt writing,
database image-id alignment, pipeline sequencing, cleanup, and the
skip-existing / skip-on-failure behaviors."""

import io
import os
import stat
import subprocess
import sys
import zlib

import numpy as np
import pytest

from semantic_meshes import testing
from semantic_meshes.data2.scannet import write_sens

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STUB = r'''#!/usr/bin/env python3
import os, sqlite3, sys

args = sys.argv[1:]
cmd = args[0]
opts = dict(zip(args[1::2], args[2::2]))

def touch(path, data=b"stub"):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)

if cmd == "feature_extractor":
    db = opts["--database_path"]
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE images (image_id INTEGER PRIMARY KEY, name TEXT)")
    names = sorted(os.listdir(opts["--image_path"]))
    # assign ids in REVERSE order to prove the driver realigns images.txt
    for i, name in enumerate(reversed(names), start=1):
        con.execute("INSERT INTO images VALUES (?, ?)", (i, name))
    con.commit()
    con.close()
elif cmd == "exhaustive_matcher":
    pass
elif cmd == "point_triangulator":
    touch(os.path.join(opts["--output_path"], "points3D.bin"))
elif cmd == "image_undistorter":
    touch(os.path.join(opts["--output_path"], "run-files"))
elif cmd == "patch_match_stereo":
    pass
elif cmd == "stereo_fusion":
    touch(opts["--output_path"])
elif cmd == "delaunay_mesher":
    touch(opts["--output_path"], b"ply stub")
else:
    sys.exit(2)
'''


@pytest.fixture
def scannet_with_stub(tmp_path):
    # minimal scene with a .sens stream
    scene = tmp_path / "scans" / "scene0000_00"
    os.makedirs(scene)
    H, W = 24, 32
    import imageio.v2 as imageio

    buf = io.BytesIO()
    imageio.imwrite(buf, np.zeros((H, W, 3), np.uint8), format="jpeg")
    cjpg = buf.getvalue()
    depth = zlib.compress(np.zeros(H * W, "<u2").tobytes())
    cams = testing.make_ring_cameras(num_views=3, width=W, height=H)
    frames = []
    for i, cam in enumerate(cams):
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = cam.rotation
        w2c[:3, 3] = cam.translation
        frames.append(dict(camera_to_world=np.linalg.inv(w2c),
                           timestamp_color=i, timestamp_depth=i,
                           color_data=cjpg, depth_data=depth))
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = W / 2, H / 2
    write_sens(str(scene / "scene0000_00.sens"), "s", intr,
               np.eye(4, dtype=np.float32), intr,
               np.eye(4, dtype=np.float32), (H, W), (H, W), 1000.0, frames)

    stub = tmp_path / "colmap"
    stub.write_text(STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return tmp_path, stub


def test_colmap_driver_end_to_end(scannet_with_stub):
    root, stub = scannet_with_stub
    env = dict(os.environ)
    env["SM_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "run_colmap_on_scannet.py"),
            "--scannet", str(root),
            "--colmap_bin", str(stub),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    ws = root / "scans" / "scene0000_00" / "colmap"
    assert (ws / "mesh.ply").exists()
    # known-pose sparse model written and id-realigned to the database
    images_txt = (ws / "sparse" / "images.txt").read_text()
    lines = [ln for ln in images_txt.splitlines() if len(ln.split()) == 10]
    assert len(lines) == 3
    # db assigned ids in reverse name order: 0.jpg -> id 3
    by_name = {ln.split()[9]: int(ln.split()[0]) for ln in lines}
    assert by_name["0.jpg"] == 3 and by_name["2.jpg"] == 1
    # quaternions valid
    q = np.asarray([float(x) for x in lines[0].split()[1:5]])
    assert abs(np.linalg.norm(q) - 1.0) < 1e-5
    # intermediates cleaned up
    assert not (ws / "images").exists()
    assert not (ws / "database.db").exists()

    # second run skips the existing workspace
    proc2 = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "run_colmap_on_scannet.py"),
            "--scannet", str(root),
            "--colmap_bin", str(stub),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc2.returncode == 0
    assert "Skipping" in proc2.stdout


def test_colmap_driver_skips_failed_scene(scannet_with_stub):
    root, stub = scannet_with_stub
    stub.write_text("#!/usr/bin/env python3\nimport sys; sys.exit(1)\n")
    env = dict(os.environ)
    env["SM_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "run_colmap_on_scannet.py"),
            "--scannet", str(root),
            "--colmap_bin", str(stub),
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    # failure is isolated per scene: driver exits 0 and cleans the workspace
    assert proc.returncode == 0
    assert "failed" in proc.stdout
    assert not (root / "scans" / "scene0000_00" / "colmap").exists()


def test_simplify_driver_with_stub(tmp_path):
    """simplify_scannet_meshes.py against a stub meshlabserver: verifies
    target-face computation, filter XML generation, and output naming."""
    from semantic_meshes.io.ply import write_mesh

    scene = tmp_path / "scans" / "scene0000_00"
    os.makedirs(scene)
    vertices, faces = testing.make_cube(3)  # 108 faces
    write_mesh(scene / "scene0000_00_vh_clean_2.labels.ply", vertices, faces)

    stub = tmp_path / "meshlabserver"
    stub.write_text(r'''#!/usr/bin/env python3
import sys
opts = dict(zip(sys.argv[1::2], sys.argv[2::2]))
script = open(opts["-s"]).read()
assert "TargetFaceNum" in script
import re
n = re.search(r'value="(\d+)" name="TargetFaceNum"', script).group(1)
with open(opts["-o"], "w") as f:
    f.write(f"stub simplified to {n} faces from {opts['-i']}\n")
''')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "simplify_scannet_meshes.py"),
            "--scannet", str(tmp_path),
            "--factor", "0.5",
            "--meshlabserver", str(stub),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = scene / "scene0000_00_vh_clean_2.labels_simplified-0.5.ply"
    assert out.exists()
    assert "simplified to 54 faces" in out.read_text()  # 0.5 * 108
