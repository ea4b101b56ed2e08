#!/usr/bin/env python3
"""Annotate a COLMAP mesh with classes from mask images; save colorized PLY.

TPU-native port of the reference script
(ref: python/scripts/colorize_mesh.py:1-92): same CLI, same pipeline —
mask PNG -> (optional unique-color remap) -> one-hot probs -> render ->
fuse -> argmax -> palette -> PLY. TF is replaced by jax/numpy.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402

parser = argparse.ArgumentParser(
    description="Annotate a colmap mesh with classes from mask images and "
    "save as colorized ply."
)
parser.add_argument("--colmap", type=str, required=True,
                    help="Path to colmap workspace folder containing "
                    "{cameras, images, points3D}.{bin|txt}")
parser.add_argument("--input_ply", type=str, required=True,
                    help="Input mesh file")
parser.add_argument("--masks", type=str, required=True,
                    help="Path to folder containing masks of images "
                    "reconstructed in the colmap workspace")
parser.add_argument("--classes", type=int, required=True,
                    help="Number of classes")
parser.add_argument("--output_ply", type=str, required=True,
                    help="Output mesh file")
parser.add_argument("--remap", action="store_true",
                    help="Masks are color images; remap unique colors to a "
                    "contiguous range of class indices")
parser.add_argument("--aggregator", type=str, default="sum",
                    choices=["sum", "summax", "mul"])
parser.add_argument("--images_equal_weight", type=float, default=0.5)
parser.add_argument("--clip_near", action="store_true",
                    help="Near-plane clip instead of culling triangles that "
                    "cross z=0 (for cameras inside the scene)")
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402
from tqdm import tqdm  # noqa: E402

if args.remap:
    color_to_class = {}

    def get_class_for_color(color):
        color = tuple(int(c) for c in color)
        if color not in color_to_class:
            color_to_class[color] = len(color_to_class)
        return color_to_class[color]


print("Creating mesh...")
mesh = semantic_meshes.data.Ply(args.input_ply)
colmap_workspace = semantic_meshes.data.Colmap(args.colmap)
renderer = semantic_meshes.render.triangles(
    mesh, clip_near=args.clip_near
)
aggregator = semantic_meshes.fusion.MeshAggregator(
    primitives=renderer.getPrimitivesNum(),
    classes=args.classes,
    aggregator=args.aggregator,
    images_equal_weight=args.images_equal_weight,
)

print("Annotating mesh...")
mask_files = sorted(
    os.path.join(args.masks, f)
    for f in os.listdir(args.masks)
    if f.lower().endswith((".png", ".jpg", ".jpeg", ".tiff", ".bmp", ".gif"))
)
for mask_file in tqdm(mask_files):
    mask = imageio.imread(mask_file)

    if args.remap:
        assert mask.ndim in (2, 3)
        channels = mask.shape[2] if mask.ndim == 3 else 1
        assert channels in (1, 3)
        shape = mask.shape[:2]
        flat = mask.reshape(-1, channels)
        unique_colors, inv = np.unique(flat, axis=0, return_inverse=True)
        unique_classes = np.array(
            [get_class_for_color(c) for c in unique_colors]
        )
        mask = unique_classes[inv].reshape(shape)

    assert mask.ndim == 2
    assert np.all(0 <= mask) and np.all(mask < args.classes)

    probs = np.eye(args.classes, dtype=np.float32)[mask]  # one-hot (H, W, C)

    primitive_indices, _ = renderer.render(
        colmap_workspace.getCamera(mask_file)
    )
    aggregator.add(primitive_indices, probs.transpose(1, 0, 2))

if args.remap:
    class_to_color = np.zeros((args.classes, 3), np.uint8)
    for color, class_index in color_to_class.items():
        class_to_color[class_index] = (
            color if len(color) == 3 else (color[0],) * 3
        )
    print(
        f"Found {len(color_to_class)} unique colors: "
        f"{[class_to_color[c].tolist() for c in sorted(color_to_class.values())]}"
    )
else:
    from semantic_meshes.utils import class_palette

    class_to_color = class_palette(args.classes)
    print(f"Generated {args.classes} unique colors")

print("Computing primitive colors...")
primitive_annotations = np.asarray(aggregator.get())
dont_care_threshold = 0.9
without_annotations = (
    primitive_annotations.sum(-1) < dont_care_threshold
)

classes = primitive_annotations.argmax(-1)
primitive_colors = class_to_color[classes]
primitive_colors = np.where(
    without_annotations[:, None], np.uint8(0), primitive_colors
)

print("Saving colorized mesh...")
mesh.save(args.output_ply, primitive_colors)
