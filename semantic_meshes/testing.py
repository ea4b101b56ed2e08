"""Synthetic scenes for tests and benchmarks.

The canonical fixture is BASELINE.json configs[0]: a subdivided cube
(~1k triangles) viewed by pinhole cameras on a ring, fused with random
class probabilities.
"""

from __future__ import annotations

import numpy as np

from .data import Camera
from .geometry import look_at


def make_cube(subdivisions=9, size=1.0):
    """Axis-aligned cube centered at origin, each face an s x s quad grid.

    Returns (vertices (V, 3) f32, faces (T, 3) i32) with
    T = 12 * subdivisions**2 (s=9 -> 972 triangles).
    """
    s = int(subdivisions)
    half = size / 2.0
    verts = []
    faces = []
    # each face: origin corner, u axis, v axis
    face_frames = [
        ([-half, -half, half], [size, 0, 0], [0, size, 0]),   # +z
        ([half, -half, -half], [-size, 0, 0], [0, size, 0]),  # -z
        ([half, -half, half], [0, 0, -size], [0, size, 0]),   # +x
        ([-half, -half, -half], [0, 0, size], [0, size, 0]),  # -x
        ([-half, half, half], [size, 0, 0], [0, 0, -size]),   # +y
        ([-half, -half, -half], [size, 0, 0], [0, 0, size]),  # -y
    ]
    for origin, u, v in face_frames:
        base = len(verts)
        origin, u, v = np.asarray(origin), np.asarray(u), np.asarray(v)
        for j in range(s + 1):
            for i in range(s + 1):
                verts.append(origin + u * (i / s) + v * (j / s))
        for j in range(s):
            for i in range(s):
                a = base + j * (s + 1) + i
                b = a + 1
                c = a + (s + 1)
                d = c + 1
                faces.append([a, b, d])
                faces.append([a, d, c])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
    )


def make_ring_cameras(num_views=4, width=256, height=192, radius=3.0,
                      elevation=0.35, focal=None, target=(0, 0, 0)):
    """Cameras on a horizontal ring looking at `target`."""
    if focal is None:
        focal = 0.9 * min(width, height)
    cams = []
    for k in range(num_views):
        ang = 2 * np.pi * k / num_views
        eye = np.array(
            [radius * np.cos(ang), elevation * radius, radius * np.sin(ang)]
        )
        rotation, translation = look_at(eye, target, [0, 1, 0])
        cams.append(
            Camera(
                rotation,
                translation,
                np.array([width, height]),
                np.array([focal, focal], np.float32),
                np.array([width / 2, height / 2], np.float32),
            )
        )
    return cams


def write_scannet_label_tsv(path, num_classes=6):
    """Minimal scannetv2-labels.combined.tsv: identity raw->nyu40 mapping
    for ids 1..num_classes (schema per the real TSV's columns used by the
    eval harness)."""
    with open(path, "w") as f:
        f.write("id\traw_category\tcategory\tnyu40id\n")
        for i in range(1, num_classes + 1):
            f.write(f"{i}\tc{i}\tc{i}\t{i}\n")


def _write_labeled_cube_ply(path, subdivisions):
    """Write a ScanNet-style labeled cube mesh (vertex x/y/z + ushort
    label, int32 face lists). Returns (vertices, faces, face_class_nyu)."""
    vertices, faces = make_cube(subdivisions=subdivisions)
    tris_per_side = len(faces) // 6
    face_class_nyu = (np.arange(len(faces)) // tris_per_side) + 1  # 1..6

    vertex_labels = np.zeros(len(vertices), np.int64)
    for f, cls in zip(faces, face_class_nyu):
        vertex_labels[f] = cls

    with open(path, "wb") as f:
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
    return vertices, faces, face_class_nyu


def build_synthetic_scannet_scene(root, name, *, subdivisions=3,
                                  num_views=4, width=128, height=96,
                                  classes=40, radius=3.0,
                                  write_probs=True, renderer=None,
                                  prob_noise=0.0, noise_seed=0,
                                  simplify_factors=()):
    """Build a fake ScanNet scene directory for eval tests/benchmarks.

    Creates scans/<name>/ with <name>_vh_clean_2.labels.ply (cube mesh,
    per-vertex raw labels 1..6 by cube side), <name>.sens (posed frames
    with jpeg color + zlib depth), label-filt/<i>.png ground truth, and
    (optionally) probs/<name>/<i>.npy one-hot predictions.

    prob_noise > 0 makes the written predictions imperfect (so fusion has
    something to fix — scripts/make_paper_graphs.py uses this to produce
    non-degenerate versions of the paper's plots): per covered pixel, the
    label is flipped to a random class with probability
    prob_noise * frame_index / (num_views - 1) (later frames are noisier,
    so per-image vs per-pixel weighting genuinely differ), then every
    distribution is smoothed with 30% uniform mass (so the mul
    aggregator sees graded confidences). Deterministic via noise_seed.

    simplify_factors: iterable of STRINGS (e.g. ("0.25",)); for each, a
    coarser cube (~factor x the faces) is written under the
    `_vh_clean_2.labels_simplified-<factor>.ply` name the eval resolves
    for --simplify <factor> — a stand-in for meshlab decimation so the
    paper's simplification sweep runs without meshlabserver.

    Returns (num_faces, num_views). Rendering the gt label images uses a
    TrianglesRenderer on the current default device — pass `renderer=None`
    to build one (a TPU makes large `subdivisions` practical).
    """
    import io
    import os
    import zlib

    import imageio.v2 as imageio

    from . import data as sm_data
    from . import render as sm_render
    from .data2.scannet import write_sens

    root = os.fspath(root)
    scene = os.path.join(root, "scans", name)
    os.makedirs(os.path.join(scene, "label-filt"), exist_ok=True)

    W, H = int(width), int(height)
    vertices, faces, face_class_nyu = _write_labeled_cube_ply(
        os.path.join(scene, f"{name}_vh_clean_2.labels.ply"), subdivisions
    )
    ply_path = os.path.join(scene, f"{name}_vh_clean_2.labels.ply")
    for factor in simplify_factors:
        # a genuinely coarser cube stands in for meshlab's quadric
        # decimation: same geometry, ~factor x the face count — the
        # filename format the eval resolves for --simplify <factor>
        sub = max(1, round(subdivisions * float(factor) ** 0.5))
        _write_labeled_cube_ply(
            os.path.join(
                scene,
                f"{name}_vh_clean_2.labels_simplified-{factor}.ply",
            ),
            sub,
        )

    cams = make_ring_cameras(num_views=num_views, width=W, height=H,
                             radius=radius)
    if renderer is None:
        mesh_obj = sm_data.Ply(ply_path)
        renderer = sm_render.triangles(mesh_obj)

    fx = fy = 0.9 * min(W, H)
    intrinsic = np.eye(4, dtype=np.float32)
    intrinsic[0, 0], intrinsic[1, 1] = fx, fy
    intrinsic[0, 2], intrinsic[1, 2] = W / 2, H / 2

    probs_dir = os.path.join(root, "probs", name)
    if write_probs:
        os.makedirs(probs_dir, exist_ok=True)
    noise_rng = np.random.default_rng(noise_seed)

    frames = []
    for i, cam in enumerate(cams):
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = cam.rotation
        w2c[:3, 3] = cam.translation
        c2w = np.linalg.inv(w2c)

        idx, _ = renderer.render(cam)
        idx_hw = np.asarray(idx).T
        covered = idx_hw != 0xFFFFFFFF
        gt = np.zeros((H, W), np.uint16)
        gt[covered] = face_class_nyu[idx_hw[covered].astype(np.int64)]
        imageio.imwrite(
            os.path.join(scene, "label-filt", f"{i}.png"), gt
        )

        if write_probs:
            probs = np.zeros((H, W, classes), np.float32)
            ys, xs = np.nonzero(covered)
            labels = gt[covered].astype(np.int64) - 1
            if prob_noise > 0:
                frame_noise = prob_noise * (
                    i / max(num_views - 1, 1)
                )
                flip = noise_rng.random(len(labels)) < frame_noise
                labels = np.where(
                    flip,
                    noise_rng.integers(0, classes, size=len(labels)),
                    labels,
                )
            probs[ys, xs, labels] = 1.0
            if prob_noise > 0:
                # 30% uniform smoothing: graded confidences for "mul"
                probs[ys, xs] = 0.7 * probs[ys, xs] + 0.3 / classes
            np.save(os.path.join(probs_dir, f"{i}.npy"), probs)

        color = np.zeros((H, W, 3), np.uint8)
        color[covered] = 128
        depth = np.full((H, W), 1000, np.uint16)
        buf = io.BytesIO()
        imageio.imwrite(buf, color, format="jpeg")
        frames.append(
            dict(
                camera_to_world=c2w,
                timestamp_color=i,
                timestamp_depth=i,
                color_data=buf.getvalue(),
                depth_data=zlib.compress(depth.tobytes()),
            )
        )

    write_sens(
        os.path.join(scene, f"{name}.sens"),
        "synthetic",
        intrinsic, np.eye(4, dtype=np.float32),
        intrinsic, np.eye(4, dtype=np.float32),
        color_hw=(H, W), depth_hw=(H, W), depth_shift=1000.0,
        frames=frames,
    )
    return len(faces), num_views


def random_probs(rng, height, width, classes, dont_care_frac=0.0):
    """Random softmax class-probability image (H, W, C) float32."""
    logits = rng.normal(size=(height, width, classes)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    if dont_care_frac > 0:
        dc = rng.random((height, width)) < dont_care_frac
        probs[dc] = 0.0
    return probs
