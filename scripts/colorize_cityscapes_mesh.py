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
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402
from tqdm import tqdm  # noqa: E402

CLASSES = 19


def build_predictor():
    if args.probs is not None:
        def predict(image, image_file):
            base = os.path.splitext(os.path.basename(image_file))[0]
            p = os.path.join(args.probs, base + ".npy")
            probs = np.load(p).astype(np.float32)
            if probs.shape[:2] != image.shape[:2]:
                raise ValueError(
                    f"{p}: probs {probs.shape} vs image {image.shape}"
                )
            return probs
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
        return np.asarray(model(image))
    return predict


print("Loading segmentation predictor...")
predict = build_predictor()

print("Creating mesh...")
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
for image_file in tqdm(image_files):
    image = imageio.imread(image_file)
    prediction = predict(image, image_file)  # (H, W, 19)
    primitive_indices, _ = renderer.render(
        colmap_workspace.getCamera(image_file)
    )
    aggregator.add(
        primitive_indices, np.transpose(prediction, (1, 0, 2))
    )

print("Computing primitive colors...")
primitive_annotations = np.asarray(aggregator.get())
dont_care_threshold = 0.9
without_annotations = primitive_annotations.sum(-1) < dont_care_threshold

classes = primitive_annotations.argmax(-1)
primitive_colors = CLASS_TO_COLOR[classes]
primitive_colors = np.where(
    without_annotations[:, None], np.uint8(0), primitive_colors
)

print("Saving colorized mesh...")
mesh.save(args.output_ply, primitive_colors)
