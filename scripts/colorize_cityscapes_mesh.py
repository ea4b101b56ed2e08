#!/usr/bin/env python3
"""Annotate a COLMAP mesh with Cityscapes classes; save colorized PLY.

TPU-native port of the flagship demo
(ref: python/scripts/colorize_cityscapes_mesh.py:1-80). The reference runs a
pretrained tfcv PSPNet; this port accepts any of:
  --probs:  a folder of precomputed per-image class-probability maps
            (<image>.npy, (H, W, 19) float)
  --model jax-unet: the bundled flax segmentation model (random weights
            unless --params is given — for pipeline testing)
  --model tfcv: the original TF model if tfcv is installed
"""

import argparse
import os
import sys
import time

_PROCESS_T0 = time.time()

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402

# Cityscapes train-id palette (ref: colorize_cityscapes_mesh.py:16-36)
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

parser = argparse.ArgumentParser(
    description="Annotate a colmap mesh with cityscapes classes and save as "
    "colorized ply."
)
parser.add_argument("--colmap", type=str, required=True)
parser.add_argument("--input_ply", type=str, required=True)
parser.add_argument("--images", type=str, required=True,
                    help="Folder with the reconstructed images")
parser.add_argument("--output_ply", type=str, required=True)
parser.add_argument("--probs", type=str, default=None,
                    help="Folder with precomputed (H, W, 19) .npy prob maps")
parser.add_argument("--probs_dtype", type=str, default="f16",
                    choices=["f32", "f16", "u8"],
                    help="With --probs: wire dtype for the host->device "
                    "prob-map upload (a 2048x1024x19 f32 map is 160 MB — "
                    "the demo's dominant cost when the device link is "
                    "slow). Fusion math stays f32 on device; f16 is "
                    "lossless for f16-on-disk maps, u8 quantizes to "
                    "p*255 (<=1/510 abs error per class)")
parser.add_argument("--model", type=str, default="jax-unet",
                    choices=["jax-unet", "tfcv"])
parser.add_argument("--params", type=str, default=None,
                    help="msgpack checkpoint for the jax model")
parser.add_argument("--aggregator", type=str, default="sum",
                    choices=["sum", "summax", "mul"])
parser.add_argument("--clip_near", action="store_true",
                    help="Near-plane clip instead of culling triangles that "
                    "cross z=0 (for cameras inside the scene)")
parser.add_argument("--sliding", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="Sliding-window inference window for the jax model "
                    "(the reference demo uses 713 713 for its PSPNet, ref: "
                    "colorize_cityscapes_mesh.py:42); windows are batched "
                    "into one MXU dispatch per image")
parser.add_argument("--sliding_overlap", type=float, default=0.2)
parser.add_argument("--multi_scale", type=float, nargs="+", default=None,
                    help="Average predictions over these input scales "
                    "(ref demo: 0.5, ref: colorize_cityscapes_mesh.py:43)")
parser.add_argument("--input_hw", type=int, nargs=2, default=(512, 512),
                    metavar=("H", "W"),
                    help="jax model input resolution")
parser.add_argument("--widths", type=int, nargs="+",
                    default=(64, 128, 256, 512),
                    help="jax model channel widths")
parser.add_argument("--timings", action="store_true",
                    help="print a per-phase wall-clock breakdown at exit")
parser.add_argument("--timings_json", type=str, default=None,
                    help="write the per-phase breakdown as JSON "
                    "({phase: {total_s, calls, median_s}}) to this path "
                    "at exit — bench drivers separate one-time costs "
                    "(device acquisition, compiles) from steady-state "
                    "per-image rates with it")
parser.add_argument("--chunk", type=int, default=0,
                    help="views per fused render+fuse dispatch: the chunk "
                    "is ONE compiled scan (distributed.fuse_views) instead "
                    "of per-view render+add dispatches — amortizes "
                    "per-dispatch overhead, which dominates on remote/"
                    "tunneled devices. 0 = auto (4 when supported), "
                    "1 = per-view path")
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from tqdm import tqdm  # noqa: E402

from semantic_meshes.profiling import PhaseTimers  # noqa: E402

timers = PhaseTimers()
# everything before this line: python + numpy/jax/flax imports, argparse
timers.record("process start (imports)", time.time() - _PROCESS_T0)

with timers.phase("device acquire"):
    # First device op + real readback: the per-process backend/device
    # acquisition (measured 1-240 s through a tunneled PJRT plugin,
    # tunnel-weather dependent) lands in THIS phase so every later phase
    # times our pipeline, not the handshake.
    np.asarray(jnp.zeros((8,), jnp.float32) + 1.0)

CLASSES = 19


def build_predictor():
    if args.probs is not None:
        from semantic_meshes import probs_io

        def predict(image, image_file):
            base = os.path.join(
                args.probs,
                os.path.splitext(os.path.basename(image_file))[0],
            )
            # dense .npy (re-cast to --probs_dtype for the wire) or
            # top-k .npz (already compact; ships as stored); async
            # host->device upload from the prefetch worker so the
            # transfer overlaps the previous frame's render+fuse
            loaded = probs_io.load(base, wire=args.probs_dtype)
            shape = (loaded.values if isinstance(loaded, probs_io.TopKProbs)
                     else loaded).shape
            if tuple(shape[:2]) != image.shape[:2]:
                raise ValueError(
                    f"{base}: probs {shape} vs image {image.shape}"
                )
            return loaded
        return predict
    if args.model == "tfcv":
        import tensorflow as tf
        import tfcv

        pre = tfcv.model.pretrained.vladkryvoruchko.\
            pspnet_resnet_v1s_101_cityscapes.preprocess
        predictor = tfcv.model.pretrained.vladkryvoruchko.\
            pspnet_resnet_v1s_101_cityscapes.create()
        predictor = tfcv.predict.sliding(predictor, (713, 713), 0.2)
        predictor = tfcv.predict.multi_scale(predictor, [0.5])
        predictor = tf.function(predictor)

        def predict(image, image_file):
            x = np.expand_dims(pre(image), 0)
            return np.asarray(predictor(x))[0]
        return predict
    # jax-unet
    from semantic_meshes.models import segmentation

    model = segmentation.load_predictor(
        classes=CLASSES, params_path=args.params,
        input_hw=tuple(args.input_hw), widths=tuple(args.widths),
        sliding=tuple(args.sliding) if args.sliding else None,
        sliding_overlap=args.sliding_overlap,
        multi_scale=args.multi_scale,
    )

    def predict(image, image_file):
        # stays a device array: the prediction feeds fusion directly, a
        # host round-trip would cost 2x the map size on the device link
        return model(image)
    return predict


print("Loading segmentation predictor...")
with timers.phase("build predictor"):
    # one-time: model construction + parameter init (the jax-unet init is
    # a compiled device program — 30-130 s through a tunneled compile
    # service on a cold cache; untimed, this silently inflated any
    # "steady-state" rate derived from the total wall clock)
    predict = build_predictor()

print("Creating mesh...")
with timers.phase("setup (mesh+renderer+colmap)"):
    mesh = semantic_meshes.data.Ply(args.input_ply)
    renderer = semantic_meshes.render.triangles(
        mesh, clip_near=args.clip_near
    )
    colmap_workspace = semantic_meshes.data.Colmap(args.colmap)
    aggregator = semantic_meshes.fusion.MeshAggregator(
        primitives=renderer.getPrimitivesNum(), classes=CLASSES,
        aggregator=args.aggregator,
    )

print("Annotating mesh...")
image_files = sorted(
    os.path.join(args.images, f) for f in os.listdir(args.images)
)
if not image_files:
    sys.exit(f"no images in {args.images}")

all_cameras = [colmap_workspace.getCamera(f) for f in image_files]


def load_frame(image_file):
    """IO + predict for one frame, run on the prefetch worker: disk read,
    model inference / prob-map load, and the (async) device upload all
    overlap the previous frame's render+fuse on the main thread."""
    with timers.phase("load+predict (worker)"):
        image = imageio.imread(image_file)
        return predict(image, image_file)  # (H, W, 19)


from concurrent.futures import ThreadPoolExecutor  # noqa: E402

from semantic_meshes import distributed, probs_io  # noqa: E402
from semantic_meshes.data import stack_cameras, stack_distortions  # noqa: E402
from semantic_meshes.render import _has_distortion  # noqa: E402

chunk = args.chunk
if chunk <= 0:
    chunk = min(4, len(image_files))
distorted = _has_distortion(all_cameras)

# Budget planning, one dispatch + a few syncs for the WHOLE run: the
# chunked leg plans per resolution through distributed.plan_fuse (batched
# probes + SM_MICRO_MAX=auto routing + the uni-split gate — the same plan
# bench.py measures); the per-view leg sizes the renderer's cap policy
# over all cameras (renderer.prepare). Either way the per-frame loop
# below never overflow-resyncs or re-probes/recompiles mid-run.
with timers.phase("prepare budgets"):
    if chunk > 1:
        _plans = {}
        for cam in all_cameras:
            _plans.setdefault(tuple(int(x) for x in cam.resolution), []
                              ).append(cam)
        for (w_r, h_r), group in _plans.items():
            rot, trans, fl, pp = stack_cameras(group)
            dists = stack_distortions(group) if distorted else None
            _plans[(w_r, h_r)] = distributed.plan_fuse(
                renderer.vertices, renderer.faces, rot, trans, fl, pp,
                height=h_r, width=w_r, clip_near=renderer.clip_near,
                distortions=dists,
            )
    else:
        renderer.prepare(all_cameras)

# stable (per-process) predict_fn objects: fuse_views jit-caches on the
# predict_fn's identity, so these must be created once, not per chunk
_DENSIFY_TOPK = probs_io.TopKDensify(CLASSES)
overflows = []


def fuse_chunk(preds, cams, n_pad):
    """ONE compiled render+fuse scan over a camera chunk (incl. distorted
    SIMPLE_RADIAL/RADIAL/OPENCV cameras — each view renders under its
    virtual pinhole and resamples in the same program). Ragged tails
    are padded with repeated cameras + all-zero probability maps: zero
    probs fail the don't-care test (sum <= 0.5, ref: fusion/Mesh.h:98)
    so a pad view contributes exactly nothing to any aggregator, and the
    padded shape keeps ONE compiled program for every chunk."""
    if n_pad:
        cams = cams + [cams[-1]] * n_pad
    rot, trans, fl, pp = stack_cameras(cams)
    dists = stack_distortions(cams) if distorted else None
    if isinstance(preds[0], probs_io.TopKProbs):
        zv = jnp.zeros_like(preds[0].values)
        zi = jnp.zeros_like(preds[0].indices)
        vals = jnp.stack([p.values for p in preds] + [zv] * n_pad)
        idxs = jnp.stack([p.indices for p in preds] + [zi] * n_pad)
        probs_arg, predict_fn = (vals, idxs), _DENSIFY_TOPK
        hw = preds[0].values.shape[:2]
    else:
        arrs = [jnp.asarray(p) for p in preds]
        arrs += [jnp.zeros_like(arrs[0])] * n_pad
        probs_arg, predict_fn = jnp.stack(arrs), probs_io.densify
        hw = arrs[0].shape[:2]
    height, width = int(hw[0]), int(hw[1])
    plan = _plans[(width, height)]
    acc, overflow = distributed.fuse_views_planned(
        plan, renderer.vertices, rot, trans, fl, pp,
        probs_arg, jnp.float32(aggregator.images_equal_weight), None,
        distortions=dists,
        num_primitives=renderer.getPrimitivesNum(),
        aggregator=aggregator.aggregator, height=height, width=width,
        max_tris_per_tile=renderer.max_tris_per_tile,
        clip_near=renderer.clip_near,
        predict_fn=predict_fn,
    )
    aggregator.merge(acc)
    overflows.append(overflow)  # stays async; summed+synced at exit


def load_chunk(files):
    return [load_frame(f) for f in files]


if chunk > 1:
    chunks = [image_files[i:i + chunk]
              for i in range(0, len(image_files), chunk)]
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(load_chunk, chunks[0])
        for ci, files in enumerate(tqdm(chunks)):
            with timers.phase("wait prefetch"):
                preds = pending.result()
            if ci + 1 < len(chunks):
                pending = pool.submit(load_chunk, chunks[ci + 1])
            with timers.phase("fuse chunk (render+fuse scan)"):
                fuse_chunk(
                    preds,
                    [colmap_workspace.getCamera(f) for f in files],
                    chunk - len(files),
                )
else:
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = pool.submit(load_frame, image_files[0])
        for i, image_file in enumerate(tqdm(image_files)):
            with timers.phase("wait prefetch"):
                prediction = pending.result()
            if i + 1 < len(image_files):
                pending = pool.submit(load_frame, image_files[i + 1])
            with timers.phase("render"):
                primitive_indices, _ = renderer.render(
                    colmap_workspace.getCamera(image_file)
                )
            with timers.phase("fuse"):
                # dense f32 on device from any wire format (dequant u8 /
                # top-k reconstruct happen in one fused XLA pass)
                prediction = probs_io.densify(prediction)
                # (H, W, C) -> (W, H, C) on device (XLA transpose, no
                # host copy)
                aggregator.add(
                    primitive_indices, jnp.transpose(prediction, (1, 0, 2))
                )

if overflows:
    dropped = int(np.asarray(sum(jnp.asarray(o) for o in overflows)))
    if dropped:
        print(f"WARNING: {dropped} candidate pairs dropped by the "
              "rasterizer's budgets — geometry is missing from the "
              "fusion; re-run after renderer.prepare() on these cameras",
              file=sys.stderr)

print("Computing primitive colors...")
with timers.phase("get"):
    primitive_annotations = np.asarray(aggregator.get())
dont_care_threshold = 0.9
without_annotations = primitive_annotations.sum(-1) < dont_care_threshold

classes = primitive_annotations.argmax(-1)
primitive_colors = CLASS_TO_COLOR[classes]
primitive_colors = np.where(
    without_annotations[:, None], np.uint8(0), primitive_colors
)

print("Saving colorized mesh...")
with timers.phase("colorize+save ply"):
    mesh.save(args.output_ply, primitive_colors)
if args.timings:
    print(timers.report())
if args.timings_json:
    import json

    with open(args.timings_json, "w") as f:
        json.dump(timers.as_dict(), f)
