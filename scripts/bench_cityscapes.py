#!/usr/bin/env python3
"""End-to-end timing of the flagship demo at Cityscapes scale.

Builds a synthetic scene at --width x --height (default 2048x1024, the
Cityscapes frame size) with 19-class precomputed probability maps on
disk, then times `scripts/colorize_cityscapes_mesh.py --probs` over it
as a subprocess — the whole demo including process start, COLMAP/PLY
parsing, per-image PNG + .npy IO, render, fusion, and the colorized PLY
write. This is the unblocked format-level stand-in for the reference's
tfcv leg (ref: python/scripts/colorize_cityscapes_mesh.py:39-43): the 2D
model is external by design (ref: README.md:24-29 step 2) and its output
is exactly these per-image probability maps.

Number to beat: the reference reports ~2 s/image for the same demo on an
RTX 6000 host install (ref: README.md:91), model inference included; our
--probs leg excludes inference (it is precomputed on disk) but pays the
full ~76 MB/image float16 probs read back from disk.

Prints one JSON line. Usage:
    python scripts/bench_cityscapes.py [--views 20] [--subdivisions 64]
        [--width 2048 --height 1024] [--keep DIR]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

# the parent only builds the scene (numpy); pin it to CPU so the chip is
# free for the timed child (same pattern as scripts/tpu_resume_killtest.py
# — the tunneled TPU is single-tenant)
_user_platform = os.environ.get("SM_PLATFORM")
os.environ.setdefault("SM_PLATFORM", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# lens parameters per COLMAP model for the distorted-workspace legs
# (matching tests/test_scripts.py / test_lens_models.py magnitudes);
# SIMPLE_RADIAL is COLMAP's *default* output model, i.e. the untouched
# real-workspace entry path
_CAM_DISTORTION = {
    "PINHOLE": None,
    "SIMPLE_RADIAL": [0.08, 0, 0, 0],
    "OPENCV_FISHEYE": [0.03, -0.011, 0.002, -0.0005, 0, 0, 0, 0, 1.0],
    "THIN_PRISM_FISHEYE": [0.03, -0.011, 0.002, -0.0015, 0.0008,
                           -0.0002, 0.001, -0.0007, 3.0],
}


def write_workspace(root, *, views, width, height, cam_model):
    """(Re)write the COLMAP text workspace — cheap, so it runs even for a
    reused --keep scene: the camera model is a bench axis."""
    import numpy as np

    from semantic_meshes import testing
    from semantic_meshes.io import colmap as cio

    cams = testing.make_ring_cameras(
        num_views=views, width=width, height=height
    )

    def rot_to_quat(m):
        w = np.sqrt(max(1.0 + m[0, 0] + m[1, 1] + m[2, 2], 0.0)) / 2
        return np.array(
            [w, (m[2, 1] - m[1, 2]) / (4 * w),
             (m[0, 2] - m[2, 0]) / (4 * w),
             (m[1, 0] - m[0, 1]) / (4 * w)]
        )

    ws = os.path.join(root, "ws")
    os.makedirs(ws, exist_ok=True)
    dist = _CAM_DISTORTION[cam_model]
    cameras = {
        1: cio.ColmapCamera(
            1, cam_model, width, height,
            np.array([0.9 * height, 0.9 * height]),
            np.array([width / 2, height / 2]),
            None if dist is None else np.asarray(dist, np.float64),
        )
    }
    images = {
        i: cio.ColmapImage(
            i, rot_to_quat(np.asarray(c.rotation, np.float64)),
            np.asarray(c.translation, np.float64), 1, f"v{i:03d}.png",
        )
        for i, c in enumerate(cams, 1)
    }
    cio.write_cameras_txt(os.path.join(ws, "cameras.txt"), cameras)
    cio.write_images_txt(os.path.join(ws, "images.txt"), images)


def build_scene(root, *, views, subdivisions, width, height):
    """Cube mesh + PNG images, mirroring tests/test_scripts.py's fixture
    at scale (the COLMAP workspace is written separately by
    write_workspace; probs per wire format by ensure_probs)."""
    import imageio.v2 as imageio
    import numpy as np

    from semantic_meshes import testing
    from semantic_meshes.io.ply import write_mesh

    os.makedirs(root, exist_ok=True)
    vertices, faces = testing.make_cube(subdivisions)
    write_mesh(os.path.join(root, "mesh.ply"), vertices, faces)

    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (height, width, 3), np.uint8)
    for i in range(1, views + 1):
        imageio.imwrite(os.path.join(imgdir, f"v{i:03d}.png"), img)
    return len(faces)


def ensure_probs(root, store, *, views, width, height, classes=19):
    """Per-view probability maps in one wire format (f16|u8|topk<K> u8
    values), under probs-<store>/. The same per-view rng seed across
    formats means every store quantizes the SAME underlying f32 maps."""
    import numpy as np

    from semantic_meshes import probs_io

    probsdir = os.path.join(root, f"probs-{store}")
    marker = os.path.join(
        probsdir,
        f"v{views:03d}" + (".npz" if store.startswith("topk") else ".npy"),
    )
    if os.path.exists(marker):
        return probsdir
    os.makedirs(probsdir, exist_ok=True)
    k = int(store[4:]) if store.startswith("topk") else None
    for i in range(1, views + 1):
        # plausible peaked distributions (softmax of random logits), the
        # same statistics a real model emits
        rng = np.random.default_rng(1000 + i)
        logits = rng.normal(0, 2, (height, width, classes)).astype(
            np.float32
        )
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        base = os.path.join(probsdir, f"v{i:03d}")
        if k is not None:
            part = np.argpartition(probs, -k, axis=-1)[..., -k:]
            vals = np.take_along_axis(probs, part, axis=-1)
            order = np.argsort(-vals, axis=-1)
            idx = np.take_along_axis(part, order, axis=-1).astype(np.uint8)
            vals = np.take_along_axis(vals, order, axis=-1)
            np.savez(base + ".npz", values=probs_io.quantize_u8(vals),
                     indices=idx, classes=np.int32(classes))
        elif store == "u8":
            np.save(base + ".npy", probs_io.quantize_u8(probs))
        else:
            np.save(base + ".npy", probs.astype(np.float16))
    return probsdir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--subdivisions", type=int, default=64)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--aggregator", default="sum")
    ap.add_argument("--leg", default="probs", choices=["probs", "unet"],
                    help="probs: fuse precomputed maps from disk (pays "
                    "the full prob-map read + host->device upload); "
                    "unet: on-device inference from the 6 MB/image PNGs "
                    "— the apples-to-apples shape vs the reference's "
                    "~2 s/image, which includes its PSPNet forward")
    ap.add_argument("--probs_store", default="f16",
                    help="probs leg: on-disk format — f16, u8, or "
                    "topk<K> (e.g. topk6: K most-probable classes as "
                    "u8 values + u8 indices)")
    ap.add_argument("--probs_dtype", default=None,
                    choices=["f32", "f16", "u8"],
                    help="probs leg: wire dtype for dense maps (default: "
                    "the store's own dtype; topk stores ship as stored)")
    ap.add_argument("--timings", action="store_true",
                    help="pass --timings through to the demo and echo "
                    "its per-phase breakdown on stderr")
    ap.add_argument("--chunk", type=int, default=0,
                    help="pass through to the demo: views per fused "
                    "render+fuse dispatch (0 = auto, 1 = per-view)")
    ap.add_argument("--cam_model", default="PINHOLE",
                    choices=sorted(_CAM_DISTORTION),
                    help="COLMAP camera model for the workspace: "
                    "SIMPLE_RADIAL = COLMAP's default output (the "
                    "distorted real-workspace entry path), fisheye "
                    "models ride the extended lens wire")
    ap.add_argument("--keep", help="scene directory (reused if populated)")
    args = ap.parse_args()

    root = args.keep or tempfile.mkdtemp(prefix="sm_cityscapes_")
    marker = os.path.join(root, "images", f"v{args.views:03d}.png")
    t0 = time.time()
    if not os.path.exists(marker):
        faces = build_scene(
            root, views=args.views, subdivisions=args.subdivisions,
            width=args.width, height=args.height,
        )
    else:
        faces = 12 * args.subdivisions**2
    write_workspace(root, views=args.views, width=args.width,
                    height=args.height, cam_model=args.cam_model)
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "colorize_cityscapes_mesh.py"),
        "--colmap", os.path.join(root, "ws"),
        "--input_ply", os.path.join(root, "mesh.ply"),
        "--images", os.path.join(root, "images"),
        "--output_ply", os.path.join(root, "colorized.ply"),
        "--aggregator", args.aggregator,
    ]
    classes = 19
    detail = {}
    if args.leg == "probs":
        wire = args.probs_dtype or (
            "u8" if args.probs_store == "u8" else "f16"
        )
        probsdir = ensure_probs(
            root, args.probs_store, views=args.views,
            width=args.width, height=args.height, classes=classes,
        )
        cmd += ["--probs", probsdir, "--probs_dtype", wire]
        if args.probs_store.startswith("topk"):
            k = int(args.probs_store[4:])
            wire_mb = args.width * args.height * k * 2 / 1e6
        else:
            wire_mb = (args.width * args.height * classes
                       * {"f32": 4, "f16": 2, "u8": 1}[wire] / 1e6)
        detail = {"probs_store": args.probs_store, "probs_dtype": wire,
                  "probs_wire_mb_per_image": round(wire_mb, 1)}
    else:
        cmd += ["--model", "jax-unet"]
        detail = {"image_wire_mb_per_image": round(
            args.width * args.height * 3 / 1e6, 1)}
    if args.timings:
        cmd.append("--timings")
    if args.chunk:
        cmd += ["--chunk", str(args.chunk)]
    timings_json = os.path.join(root, "phase_timings.json")
    cmd += ["--timings_json", timings_json]
    build_s = time.time() - t0

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if _user_platform is None:
        env.pop("SM_PLATFORM", None)  # child: environment default (TPU)
    env.setdefault("SM_COMPILE_CACHE",
                   os.path.expanduser("~/.cache/sm_xla"))
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout + proc.stderr)
        sys.exit(1)
    if not os.path.exists(os.path.join(root, "colorized.ply")):
        sys.stderr.write("no output PLY\n")
        sys.exit(1)
    if args.timings:
        tail = proc.stdout[proc.stdout.find("phase timings:"):]
        sys.stderr.write(tail + "\n")

    # steady-state rate = the MARGINAL per-image cost of the frame loop:
    # median call duration x calls over the loop phases only (medians are
    # compile-free and skip the first-chunk prefetch warm-up; the loader
    # thread overlaps the fused dispatch, so main-thread loop time is
    # exactly wait-prefetch + fuse). Everything else — python/jax imports,
    # device acquisition (1-240 s of tunnel weather), predictor build +
    # param-init compile, scene setup, budget probes, first-call XLA
    # compiles, PLY save — is one-time and reported separately: a long
    # run amortizes it, and the earlier formula (wall - acquire -
    # first-call overhead) silently charged all of it to "steady".
    phase_detail = {}
    loop_phases = ("wait prefetch", "fuse chunk (render+fuse scan)",
                   "render", "fuse")
    if os.path.exists(timings_json):
        with open(timings_json) as f:
            phases = json.load(f)
        acquire_s = phases.get("device acquire", {}).get("total_s", 0.0)
        first_call_s = sum(
            max(0.0, p["total_s"] - p["median_s"] * p["calls"])
            for name, p in phases.items() if name != "device acquire"
        )
        steady_s = sum(
            phases[n]["median_s"] * phases[n]["calls"]
            for n in loop_phases if n in phases
        )
        phase_detail = {
            "device_acquire_s": round(acquire_s, 1),
            "first_call_overhead_s": round(first_call_s, 1),
            "one_time_s": round(max(0.0, wall - steady_s), 1),
            "steady_s_per_image": round(steady_s / args.views, 3),
            "phases": phases,
        }

    print(json.dumps({
        "metric": "cityscapes_demo_s_per_image",
        "value": round(wall / args.views, 3),
        "unit": "s/image (end-to-end incl. process start + IO)",
        "vs_reference_2s": round(2.0 / (wall / args.views), 1),
        "detail": {
            "leg": args.leg,
            "cam_model": args.cam_model,
            "views": args.views,
            "resolution": [args.width, args.height],
            "triangles": faces,
            "total_wall_s": round(wall, 1),
            "scene_build_s": round(build_s, 1),
            "chunk": args.chunk,
            **detail,
            **phase_detail,
            "scene_dir": root,
        },
    }))


if __name__ == "__main__":
    main()
