#!/usr/bin/env python3
"""Evaluate semantic-meshes on the ScanNet dataset (TPU-native port).

Port of the reference benchmark (ref: eval-scannet/eval_scannet.py:1-355):
same CLI, pipeline and YAML result schema —
  per scene: parse .sens -> build renderer (triangles | texels) ->
  per frame: render-or-load-cache + predict + 2D network metrics + fuse ->
  vertex (3D) metrics via face->vertex adjacency -> re-render pass for
  fused 2D metrics -> YAML {params, metrics{vertex,image_network,image_fused}}.

TF/tfcv are replaced by jnp metrics (semantic_meshes.metrics) and a pluggable
predictor (--model tfcv|jax-unet|probs). Render+fusion stay on device; the
loader thread pool overlaps IO with compute (the reference used tinypl,
ref lines 161-201).
"""

import argparse
import os
import sys
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402
from semantic_meshes import metrics as sm_metrics  # noqa: E402

parser = argparse.ArgumentParser(
    description="Evaluate semantic-meshes on the scannet dataset"
)
parser.add_argument("--scannet", type=str, required=True,
                    help="Path to scannet directory")
parser.add_argument("--images_equal_weight", type=float, default=0.5,
                    help="Soft boolean flag: 1.0 weights images equally and "
                    "0.0 weights pixels equally in the fusion step")
parser.add_argument("--frames_step", type=int, default=1,
                    help="Only use every n-th frame from a scene's frames")
parser.add_argument("--aggregator", type=str, default="mul",
                    choices=["sum", "summax", "mul"])
parser.add_argument("--debug", type=str, default=None,
                    help="Path where debugging images/plys are stored for "
                    "the first scene")
parser.add_argument("--output", type=str, default=None,
                    help="File/directory where results will be stored")
parser.add_argument("--mesh", type=str, default="scannet",
                    choices=["scannet", "colmap"])
parser.add_argument("--simplify", type=str, default="1.0",
                    help="Factor by which the mesh has been simplified")
parser.add_argument("--offset", type=int, default=0,
                    help="Skip the first number of scenes")
parser.add_argument("--num", type=int, default=-1,
                    help="Number of scenes to use")
parser.add_argument("--cache", type=str, default=None,
                    help="Cache directory for rendered primitive images")
parser.add_argument("--mode", type=str, default="triangles",
                    choices=["triangles", "texels"])
parser.add_argument("--texel_resolution", type=float, default=0.1)
parser.add_argument("--model", type=str, default="tfcv",
                    choices=["tfcv", "jax-unet", "probs"],
                    help="Predictor backend: original tfcv ESANet, bundled "
                    "jax model, or precomputed probability maps")
parser.add_argument("--probs_dir", type=str, default=None,
                    help="With --model probs: <scene>/<frame>.npy dense "
                    "maps or <scene>/<frame>.npz top-k maps "
                    "(precompute_probs.py --topk)")
parser.add_argument("--probs_dtype", type=str, default="f32",
                    choices=["f32", "f16", "bf16", "u8"],
                    help="With --model probs: wire dtype for the per-frame "
                    "host->device prob-map upload (the eval's dominant "
                    "cost on a tunneled device — a 1296x968x40 f32 map is "
                    "200 MB/frame). Fusion and metrics math stays f32 on "
                    "device; f16 halves the transfer at <=2^-11 relative "
                    "probability error, u8 quarters it at <=1/510 abs "
                    "error; top-k .npz maps ship as stored")
parser.add_argument("--params", type=str, default=None,
                    help="With --model jax-unet: flax msgpack checkpoint of "
                    "trained RGBDUNet weights (random init otherwise)")
parser.add_argument("--model_widths", type=str, default="64,128,256,512",
                    help="With --model jax-unet: encoder channel widths "
                    "(must match the checkpoint)")
parser.add_argument("--model_input_hw", type=str, default="480,640",
                    help="With --model jax-unet: network input H,W "
                    "(images are resized in/out)")
parser.add_argument("--max_frames", type=int, default=None)
parser.add_argument("--timings", action="store_true",
                    help="Print per-phase wall-clock timings at the end")
parser.add_argument("--checkpoint", type=str, default=None,
                    help="Directory for mid-run checkpoints: per-scene "
                    "aggregator state + global metric state. Re-running "
                    "with the same directory resumes exactly where an "
                    "interrupted run stopped")
parser.add_argument("--checkpoint_every", type=int, default=500,
                    help="Checkpoint cadence in fused frames (0 = only at "
                    "scene boundaries). One checkpoint dir holds one "
                    "parametrization; a mismatched manifest starts fresh")
parser.add_argument("--crash_after", type=int, default=None,
                    help="(testing) abort the process after fusing N frames")
parser.add_argument("--compile_cache", type=str, default=None,
                    help="Persistent XLA compilation cache directory "
                    "(SM_COMPILE_CACHE env equivalent)")
parser.add_argument("--no_face_buckets", action="store_true",
                    help="Disable face-count bucketing (bucketing pads "
                    "each mesh to a coarse size bucket so similar scenes "
                    "share XLA compilations; outputs are identical)")
parser.add_argument("--clip_near", action="store_true",
                    help="Near-plane clip instead of culling triangles that "
                    "cross z=0 (recommended for indoor scenes)")
args = parser.parse_args()

if args.compile_cache:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", args.compile_cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import yaml  # noqa: E402
import imageio.v2 as imageio  # noqa: E402
from tqdm import tqdm  # noqa: E402

from semantic_meshes.profiling import PhaseTimers  # noqa: E402

timers = PhaseTimers()

dont_care_threshold = 0.9
classes_num = 40
from semantic_meshes.utils import class_palette  # noqa: E402

class_to_color = class_palette(classes_num)

# ---------------------------------------------------------------- scenes
scans_dir = os.path.join(args.scannet, "scans")
scenes = sorted(
    os.path.join(scans_dir, f)
    for f in os.listdir(scans_dir)
    if f.startswith("scene")
)
total_scenes = len(scenes)
if args.mesh == "scannet":
    if float(args.simplify) == 1.0:
        scenes = [
            (s, os.path.join(s, os.path.basename(s) + "_vh_clean_2.labels.ply"))
            for s in scenes
        ]
    else:
        scenes = [
            (
                s,
                os.path.join(
                    s,
                    os.path.basename(s)
                    + f"_vh_clean_2.labels_simplified-{args.simplify}.ply",
                ),
            )
            for s in scenes
        ]
else:
    scenes = [(s, os.path.join(s, "colmap", "mesh.ply")) for s in scenes]
scenes = [(s, m) for s, m in scenes if os.path.isfile(m)]
mesh_scenes = len(scenes)
scenes = scenes[args.offset:]
if args.num < 0:
    args.num = len(scenes)
scenes = scenes[: args.num]
print(
    f"Found {total_scenes} total scenes in {args.scannet}, {mesh_scenes} "
    f"scenes with mesh type {args.mesh}, using {len(scenes)} scenes for "
    "evaluation"
)

# ---------------------------------------------------------------- results
result = {"metrics": {}, "params": {}}
result["params"]["images_equal_weight"] = args.images_equal_weight
result["params"]["frames_step"] = args.frames_step
result["params"]["mode"] = args.mode
result["params"]["aggregator"] = args.aggregator
result["params"]["mesh"] = args.mesh
result["params"]["num"] = args.num
result["params"]["offset"] = args.offset
result["params"]["simplify"] = args.simplify
if args.mode == "texels":
    result["params"]["texel_resolution"] = args.texel_resolution

# skip already-computed parametrizations (ref: eval_scannet.py:70-78)
if args.output is not None and os.path.isdir(args.output):
    for file in os.listdir(args.output):
        if file.endswith(".yaml"):
            path = os.path.join(args.output, file)
            with open(path) as f:
                result2 = yaml.safe_load(f)
            if result2 is not None and result2.get("params") == result["params"]:
                print(f"Parametrization already exists in {path}")
                sys.exit(0)
if args.debug is not None:
    os.makedirs(args.debug, exist_ok=True)

# ---------------------------------------------------------------- model
print("Loading predictor...")
if args.model == "tfcv":
    import tensorflow as tf
    import tfcv

    _model = tfcv.model.pretrained.tuinicr.\
        esanet_resnet_v1b_34_nbt1d_nyuv2.create()
    _preprocess = tfcv.model.pretrained.tuinicr.\
        esanet_resnet_v1b_34_nbt1d_nyuv2.preprocess

    def predict_probs(color, depth, out_hw):
        depth_t = tf.cast(tf.expand_dims(depth, -1), "float32")
        depth_p = tf.image.resize(depth_t, (480, 640), method="nearest")
        color_p = tf.image.resize(color, (480, 640), method="bilinear")
        color_p, depth_p = _preprocess(color_p, depth_p)
        pred = _model(
            [np.expand_dims(color_p, 0),
             np.expand_dims(np.expand_dims(depth_p, 0), -1)],
            training=False,
        )[0]
        pred = tf.image.resize(pred, out_hw, method="bilinear")
        return np.asarray(pred)

elif args.model == "jax-unet":
    from semantic_meshes.models import segmentation

    _predict = segmentation.load_rgbd_predictor(
        classes=classes_num,
        params_path=args.params,
        widths=tuple(int(w) for w in args.model_widths.split(",")),
        input_hw=tuple(int(v) for v in args.model_input_hw.split(",")),
    )

    def predict_probs(color, depth, out_hw):
        import jax

        probs = _predict(color, depth)  # device-resident
        if probs.shape[:2] != tuple(out_hw):
            probs = jax.image.resize(
                probs, tuple(out_hw) + (classes_num,), "bilinear"
            )
        return probs

else:  # precomputed probs: resolved per frame in the loader (see load_frame)
    predict_probs = None


# ---------------------------------------------------------------- labels
print("Creating label maps from scannet to nyu40...")
tsv_path = os.path.join(args.scannet, "scannetv2-labels.combined.tsv")
with open(tsv_path) as f:
    lines = [ln.strip() for ln in f.read().split("\n") if ln.strip()]
header = lines[0].split()
columns = defaultdict(list)
for line in lines[1:]:
    values = line.split("\t")
    assert len(values) <= len(header)
    for name, value in zip(header[: len(values)], values):
        columns[name].append(value.strip())
scannet_to_nyu40 = {
    int(s): int(n) for s, n in zip(columns["id"], columns["nyu40id"])
}
max_id = max(scannet_to_nyu40.keys())
scannet_to_nyu40 = np.asarray(
    [scannet_to_nyu40.get(i, 0) for i in range(max_id + 1)]
)
assert np.all(scannet_to_nyu40 >= 0)
scannet_to_nyu40 = scannet_to_nyu40 - 1  # -1 == don't care
assert np.all(scannet_to_nyu40 < 40)


def load_gt_labels(scene, index):
    """Ground-truth as int32 labels (-1 = ignore): ~40x less device traffic
    than one-hot tensors, which dominates wall-clock on tunneled TPUs."""
    gt = imageio.imread(os.path.join(scene, "label-filt", f"{index}.png"))
    gt = np.clip(gt, 0, max_id)
    return scannet_to_nyu40[gt.astype(np.int64)].astype(np.int32)


# ---------------------------------------------------------------- metrics
def metric_group(dontcare_prediction):
    return [
        sm_metrics.Accuracy(classes_num, dontcare_prediction),
        sm_metrics.MeanIoU(classes_num, dontcare_prediction),
        sm_metrics.ConfusionMatrix(classes_num, dontcare_prediction),
    ]


vertex_metrics = metric_group("error")
image_metrics_network = metric_group("forbidden")
image_metrics_fused = metric_group("error")

# ------------------------------------------------------------- checkpoints
# True mid-run resume (beyond the reference's render cache + YAML skip):
# per-scene aggregator snapshots (semantic_meshes.checkpoint) plus a global
# manifest with the three metric groups' confusion matrices and the frame
# cursor. The aggregator file is written BEFORE the manifest, and the frame
# loop skips fusion and metrics by their OWN cursors, so a crash between
# the two writes never double-counts either.
import json  # noqa: E402

_manifest_path = (
    os.path.join(args.checkpoint, "manifest.npz") if args.checkpoint else None
)
_fused_frames_total = 0


def _agg_ckpt_path(scene_name):
    return os.path.join(args.checkpoint, f"agg-{scene_name}.npz")


def _save_manifest(scenes_done, current_scene, frames_done):
    meta = dict(
        scenes_done=sorted(scenes_done),
        current_scene=current_scene,
        frames_done=int(frames_done),
        params=result["params"],
    )
    tmp = _manifest_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            vertex_cm=np.asarray(vertex_metrics[0].full_matrix),
            network_cm=np.asarray(image_metrics_network[0].full_matrix),
            fused_cm=np.asarray(image_metrics_fused[0].full_matrix),
        )
        f.flush()
        os.fsync(f.fileno())  # fsync before rename: survive power loss,
        # not just SIGKILL (same rationale as checkpoint.save_aggregator)
    os.replace(tmp, _manifest_path)


def _load_manifest():
    if _manifest_path is None or not os.path.isfile(_manifest_path):
        return None
    data = np.load(_manifest_path)
    meta = json.loads(bytes(data["meta"].tobytes()).decode())
    if meta.get("params") != result["params"]:
        print("Checkpoint manifest is for a different parametrization; "
              "starting fresh")
        return None
    import jax.numpy as _jnp

    for group, key in ((vertex_metrics, "vertex_cm"),
                       (image_metrics_network, "network_cm"),
                       (image_metrics_fused, "fused_cm")):
        for m in group:
            m._cm = _jnp.asarray(data[key])
    return meta


_scenes_done = set()
_resume_scene, _resume_frames = None, 0
if args.checkpoint:
    os.makedirs(args.checkpoint, exist_ok=True)
    _manifest = _load_manifest()
    if _manifest is not None:
        _scenes_done = set(_manifest["scenes_done"])
        _resume_scene = _manifest["current_scene"]
        _resume_frames = _manifest["frames_done"]
        print(f"Resuming: {len(_scenes_done)} scene(s) done"
              + (f", {_resume_frames} frames into {_resume_scene}"
                 if _resume_scene else ""))

# ---------------------------------------------------------------- main loop
for scene_index, (scene, input_mesh_file) in enumerate(scenes):
    name = os.path.basename(scene)
    if name in _scenes_done:
        print(f"Scene {name} already fused (checkpoint); skipping")
        continue
    sens = semantic_meshes.data2.SensFile(
        os.path.join(scene, name + ".sens"), max_frames=args.max_frames
    )
    resolution = np.array([sens.color_height, sens.color_width])

    # camera sanity checks (ref: eval_scannet.py:130-142)
    if not np.all(np.isclose(sens.extrinsic_color, np.eye(4))):
        raise ValueError(f"Invalid color extrinsics: {sens.extrinsic_color}")
    focal_lengths = np.asarray(
        [sens.intrinsic_color[0, 0], sens.intrinsic_color[1, 1]]
    )
    principal_point = np.asarray(
        [sens.intrinsic_color[0, 2], sens.intrinsic_color[1, 2]]
    )
    chk = np.asarray(sens.intrinsic_color).copy()
    chk[0, 0] = chk[1, 1] = 1
    chk[0, 2] = chk[1, 2] = 0
    if not np.all(np.isclose(chk, np.eye(4))):
        raise ValueError(f"Invalid color intrinsics: {sens.intrinsic_color}")

    def frame_camera(frame):
        camera_to_world = np.linalg.inv(frame.camera_to_world)
        return semantic_meshes.data.Camera(
            camera_to_world[:3, :3],
            camera_to_world[:3, 3],
            np.asarray([resolution[1], resolution[0]]),
            focal_lengths,
            principal_point,
        )

    print("Initializing semantic-meshes...")
    mesh = semantic_meshes.data.Ply(input_mesh_file)
    if args.mode == "triangles":
        renderer = semantic_meshes.render.triangles(
            mesh, clip_near=args.clip_near,
            bucket=not args.no_face_buckets,
        )
    else:
        cameras = [
            frame_camera(fr) for fr in sens.frames[:: args.frames_step]
        ]
        renderer = semantic_meshes.render.texels(
            mesh, cameras, args.texel_resolution, clip_near=args.clip_near,
            bucket=not args.no_face_buckets,
        )
    # size the dense candidate budgets over the WHOLE frame set in one
    # batched probe: per-frame renders then never breach mid-scene (a
    # breach costs a sync + re-probe + recompile — 10-100+ s through a
    # tunneled compile service) and each resolution compiles exactly one
    # program, stable across runs for the persistent compile cache
    renderer.prepare(
        [frame_camera(fr) for fr in sens.frames[:: args.frames_step]]
    )
    aggregator = semantic_meshes.fusion.MeshAggregator(
        primitives=renderer.getPrimitivesNum(),
        classes=classes_num,
        aggregator=args.aggregator,
        images_equal_weight=args.images_equal_weight,
    )
    agg_done = 0
    metrics_done = _resume_frames if name == _resume_scene else 0
    if args.checkpoint and os.path.isfile(_agg_ckpt_path(name)):
        from semantic_meshes.checkpoint import load_aggregator

        _agg, agg_done, _ = load_aggregator(_agg_ckpt_path(name))
        if _agg.primitives == aggregator.primitives:
            aggregator = _agg
            print(f"Restored aggregator for {name} at {agg_done} frames")
        else:
            agg_done = 0
            print(f"Aggregator checkpoint for {name} has "
                  f"{_agg.primitives} primitives, expected "
                  f"{aggregator.primitives}; starting the scene fresh")
            metrics_done = 0
    print(
        f"Loaded scene with {renderer.getPrimitivesNum()} mesh-primitives "
        f"and {len(sens.frames)} frames"
    )

    frames = list(enumerate(sens.frames))[:: args.frames_step]

    # cache config (ref: eval_scannet.py:165-184, 227-229)
    cache_dir = None
    if args.cache is not None:
        mode = (
            "triangles" if args.mode == "triangles"
            else f"texels-{args.texel_resolution}"
        )
        cache_dir = os.path.join(
            args.cache, name,
            f"primitive_indices-{mode}-simplify-{args.simplify}",
        )
        os.makedirs(cache_dir, exist_ok=True)

    def load_frame(item):
        """IO worker: decode color/depth/gt + cached primitive image."""
        index, frame = item
        cached = None
        cache_file = None
        if cache_dir is not None:
            cache_file = os.path.join(cache_dir, f"frame-{index}.npz")
            if os.path.isfile(cache_file):
                data = np.load(cache_file)
                if "data" in data:
                    cached = data["data"]
        color = frame.decompress_color(sens.color_compression_type)
        depth = np.frombuffer(
            frame.decompress_depth(sens.depth_compression_type), dtype="<u2"
        ).reshape(sens.depth_height, sens.depth_width)
        gt_labels = load_gt_labels(scene, index)
        probs = None
        if args.model == "probs":
            from semantic_meshes import probs_io

            # dense .npy (re-cast to --probs_dtype for the wire) or
            # top-k .npz from precompute_probs.py --topk; starts the
            # (async) host->device upload from the IO worker so the
            # transfer overlaps the previous frame's compute instead
            # of serializing with it on the main thread
            probs = probs_io.load(
                os.path.join(args.probs_dir, name, str(index)),
                wire=args.probs_dtype,
            )
        return (index, frame, cached, cache_file, color, depth, gt_labels,
                probs)

    import jax.numpy as jnp

    done_prefix = min(agg_done, metrics_done)
    todo = frames[done_prefix:]
    with ThreadPoolExecutor(max_workers=4) as pool:
        for fi, (index, frame, cached, cache_file, color, depth, gt_labels,
                 probs) in tqdm(enumerate(pool.map(load_frame, todo),
                                          start=done_prefix),
                                total=len(todo)):
            # render (or reuse cached primitive image); the whole frame
            # pipeline stays on device — only labels/jpegs cross the host
            # boundary
            with timers.phase("render"):
                if cached is None:
                    primitive_indices_wh, _depth_r = renderer.render(
                        frame_camera(frame)
                    )
                    if cache_file is not None and args.mesh == "scannet":
                        np.savez_compressed(
                            cache_file,
                            data=np.asarray(primitive_indices_wh).T,
                        )
                else:
                    primitive_indices_wh = jnp.asarray(cached).T

            with timers.phase("predict"):
                if probs is None:
                    probs = jnp.asarray(
                        predict_probs(color, depth, tuple(resolution))
                    )
                else:
                    from semantic_meshes import probs_io

                    probs = probs_io.densify(probs)

            if fi >= metrics_done:
                with timers.phase("metrics_network"):
                    for m in image_metrics_network:
                        m.update_state_labels(gt_labels, probs)

            if fi >= agg_done:
                with timers.phase("fuse"):
                    aggregator.add(
                        primitive_indices_wh, jnp.transpose(probs, (1, 0, 2))
                    )
                _fused_frames_total += 1

            if (args.checkpoint and args.checkpoint_every > 0
                    and (fi + 1) % args.checkpoint_every == 0):
                from semantic_meshes.checkpoint import save_aggregator

                save_aggregator(_agg_ckpt_path(name), aggregator,
                                views_done=max(fi + 1, agg_done))
                _save_manifest(_scenes_done, name,
                               max(fi + 1, metrics_done))
            if (args.crash_after is not None
                    and _fused_frames_total >= args.crash_after):
                print(f"(--crash_after) aborting after "
                      f"{_fused_frames_total} fused frames")
                sys.exit(3)

            if args.debug is not None and index % 100 == 0:
                imageio.imwrite(
                    os.path.join(args.debug, f"{index}_color.png"), color
                )
                imageio.imwrite(
                    os.path.join(args.debug, f"{index}_gt.png"),
                    sm_metrics.colorize_classes(
                        np.maximum(gt_labels, 0), class_to_color,
                        gt_labels < 0,
                    ),
                )
                imageio.imwrite(
                    os.path.join(args.debug, f"{index}_pred.png"),
                    sm_metrics.colorize_classes(
                        np.asarray(probs).argmax(-1), class_to_color
                    ),
                )

    if args.checkpoint:
        # frame loop complete: snapshot so a crash in the vertex/fused
        # passes below resumes without redoing any frame
        from semantic_meshes.checkpoint import save_aggregator

        save_aggregator(_agg_ckpt_path(name), aggregator,
                        views_done=len(frames))
        _save_manifest(_scenes_done, name, len(frames))

    print("Computing primitive annotations...")
    pred_primitive_annotations = np.asarray(aggregator.get())
    pred_primitive_dontcare = (
        pred_primitive_annotations.sum(-1) < dont_care_threshold
    )

    # ---------------- vertex (3D) metrics (ref: eval_scannet.py:244-287)
    if (args.mode == "triangles" and args.mesh == "scannet"
            and float(args.simplify) == 1.0):
        from semantic_meshes.io.ply import read_ply

        gt_mesh = read_ply(
            os.path.join(scene, name + "_vh_clean_2.labels.ply")
        )
        face_to_vertices = np.asarray(
            gt_mesh["face"].data["vertex_indices"], np.int64
        )
        n_vertices = len(gt_mesh["vertex"].data["x"])
        vertex_to_faces_dict = defaultdict(list)
        for face, vs in enumerate(face_to_vertices):
            for v in vs:
                vertex_to_faces_dict[v].append(face)
        max_len = max(len(v) for v in vertex_to_faces_dict.values())
        vertex_to_faces = np.full((n_vertices, max_len), -1, np.int64)
        for v in range(n_vertices):
            fs = vertex_to_faces_dict[v]
            vertex_to_faces[v, : len(fs)] = fs

        gt_vertex_labels = np.asarray(
            gt_mesh["vertex"].data["label"], np.int64
        ) - 1
        gt_vertex_annotations = np.asarray(
            sm_metrics.one_hot_with_ignore(gt_vertex_labels, classes_num)
        )
        gt_face = gt_vertex_annotations[face_to_vertices].sum(1)
        gt_face_dontcare = gt_face.sum(-1) < dont_care_threshold
        gt_face_annotations = np.eye(classes_num, dtype=np.float32)[
            gt_face.argmax(-1)
        ]

        pred_face_annotations = pred_primitive_annotations
        # gather with -1 padding contributing zeros (tf.gather OOB semantics,
        # ref: eval_scannet.py:314 comment)
        padded = np.concatenate(
            [pred_face_annotations,
             np.zeros((1, classes_num), np.float32)], 0
        )
        pred_vertex = padded[vertex_to_faces].sum(1)
        pred_vertex_dontcare = pred_vertex.sum(-1) < dont_care_threshold
        with np.errstate(invalid="ignore"):
            pred_vertex = pred_vertex / pred_vertex.sum(-1, keepdims=True)
        pred_vertex = np.where(
            pred_vertex_dontcare[:, None], 0.0,
            np.nan_to_num(pred_vertex),
        )
        for m in vertex_metrics:
            m.update_state(gt_vertex_annotations, pred_vertex)

        if args.debug is not None:
            pc = sm_metrics.colorize_classes(
                pred_face_annotations.argmax(-1), class_to_color,
                pred_primitive_dontcare,
            )
            mesh.save(os.path.join(args.debug, "mesh_pred.ply"), pc)
            gc = sm_metrics.colorize_classes(
                gt_face_annotations.argmax(-1), class_to_color,
                gt_face_dontcare,
            )
            mesh.save(os.path.join(args.debug, "mesh_gt.ply"), gc)

    # ---------------- fused 2D metrics (ref: eval_scannet.py:300-316)
    import jax.numpy as jnp

    model_renderer = aggregator.renderer()
    for index, frame in tqdm(frames):
        cached = None
        if cache_dir is not None:
            cf = os.path.join(cache_dir, f"frame-{index}.npz")
            if os.path.isfile(cf):
                data = np.load(cf)
                if "data" in data:
                    cached = data["data"]
        if cached is not None:
            prim_hw = jnp.asarray(cached)
        else:
            primitive_indices, _ = renderer.render(frame_camera(frame))
            prim_hw = primitive_indices.T
        gt_labels = load_gt_labels(scene, index)
        pred_probs = model_renderer.render(prim_hw, background=0.0)
        for m in image_metrics_fused:
            m.update_state_labels(gt_labels, pred_probs)
        if args.debug is not None and index % 100 == 0:
            pp = np.asarray(pred_probs)
            imageio.imwrite(
                os.path.join(args.debug, f"{index}_fused.png"),
                sm_metrics.colorize_classes(
                    pp.argmax(-1), class_to_color, pp.sum(-1) < 0.5,
                ),
            )

    if args.checkpoint:
        # scene complete: its vertex/network/fused contributions are all in
        # the metric groups now — commit them and retire the scene's
        # aggregator snapshot
        _scenes_done.add(name)
        _save_manifest(_scenes_done, None, 0)
        if os.path.isfile(_agg_ckpt_path(name)):
            os.remove(_agg_ckpt_path(name))

    # aggregate overflow observability: a post-first-frame candidate-cap
    # breach is invisible to the async per-frame path; sum the per-frame
    # device counters once per scene (one sync) so dropped geometry is
    # always reported
    dropped = renderer.overflow_total()
    if dropped:
        print(f"WARNING: rasterizer dropped {dropped} candidate pairs "
              f"in scene {name} (raise the candidate budget)")

    # per-scene report (ref: eval_scannet.py:322-326)
    row = [scene_index + 1]
    headers = ["Scenes"]
    for prefix, group in [
        ("Vertex", vertex_metrics),
        ("ImageNetwork", image_metrics_network),
        ("ImageFused", image_metrics_fused),
    ]:
        for m in group:
            v = np.asarray(m.result())
            row.append(float(v) if v.ndim == 0 else "<cm>")
            headers.append(f"{prefix}-{m.name}")
    print(" | ".join(headers))
    print(" | ".join(str(r)[:12] for r in row))

    if args.debug is not None:
        print("Stopping after first scene due to debug mode")
        break

# ---------------------------------------------------------------- output
for prefix, group in [
    ("vertex", vertex_metrics),
    ("image_network", image_metrics_network),
    ("image_fused", image_metrics_fused),
]:
    result["metrics"][prefix] = {}
    for m in group:
        value = np.asarray(m.result())
        if value.ndim > 1:
            result["metrics"][prefix][m.name] = value.tolist()
        else:
            result["metrics"][prefix][m.name] = float(value)

if args.output:
    os.makedirs(args.output, exist_ok=True)
    i = 1
    while True:
        file = os.path.join(args.output, f"run-{i}.yaml")
        if not os.path.isfile(file):
            break
        i += 1
    print(f"Saving results to {file}")
    with open(file, "w") as f:
        yaml.dump(result, f, default_flow_style=False)

if args.timings:
    print(timers.report())
print("Results:")
print({"metrics": {k: {m: ("<matrix>" if isinstance(v2, list) else v2)
                       for m, v2 in v.items()}
                   for k, v in result["metrics"].items()},
       "params": result["params"]})
