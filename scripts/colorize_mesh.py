#!/usr/bin/env python3
"""Fuse per-image segmentation masks onto a COLMAP-reconstructed mesh.

CLI-parity port of the reference workflow
(ref: python/scripts/colorize_mesh.py:1-92) — flag names match the
reference so existing invocations keep working; the pipeline runs on
jax/numpy instead of TF: mask PNG -> (optional color->class remap) ->
one-hot probabilities -> render primitive indices -> fuse -> argmax ->
palette -> colorized PLY.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402

parser = argparse.ArgumentParser(
    description="Project 2D segmentation masks onto the triangles of a "
    "COLMAP mesh and write the fused result as a per-face-colored PLY."
)
parser.add_argument("--colmap", type=str, required=True,
                    help="COLMAP workspace directory (must hold "
                    "cameras/images/points3D as .bin or .txt)")
parser.add_argument("--input_ply", type=str, required=True,
                    help="Mesh to annotate (PLY)")
parser.add_argument("--masks", type=str, required=True,
                    help="Directory of mask images, one per reconstructed "
                    "view, named like the COLMAP image entries")
parser.add_argument("--classes", type=int, required=True,
                    help="Class count of the segmentation")
parser.add_argument("--output_ply", type=str, required=True,
                    help="Where to write the colorized mesh (PLY)")
parser.add_argument("--remap", action="store_true",
                    help="Treat masks as color images and assign each "
                    "distinct color a class index on first sight")
parser.add_argument("--aggregator", type=str, default="sum",
                    choices=["sum", "summax", "mul"])
parser.add_argument("--images_equal_weight", type=float, default=0.5)
parser.add_argument("--clip_near", action="store_true",
                    help="Near-plane clip instead of culling triangles that "
                    "cross z=0 (for cameras inside the scene)")
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402
from tqdm import tqdm  # noqa: E402

# color tuple -> class index, grown in first-sight order across all masks
color_to_class = {}

print("Loading mesh + COLMAP workspace")
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

print("Fusing masks")
mask_files = sorted(
    os.path.join(args.masks, f)
    for f in os.listdir(args.masks)
    if f.lower().endswith((".png", ".jpg", ".jpeg", ".tiff", ".bmp", ".gif"))
)
# one batched budget probe over the full camera set (no mid-loop
# re-probe/recompile; see render.TrianglesRenderer.prepare)
renderer.prepare([colmap_workspace.getCamera(f) for f in mask_files])
for mask_file in tqdm(mask_files):
    mask = imageio.imread(mask_file)

    if args.remap:
        assert mask.ndim in (2, 3)
        assert (mask.shape[2] if mask.ndim == 3 else 1) in (1, 3)
        from semantic_meshes.utils import remap_mask_colors

        mask = remap_mask_colors(mask, color_to_class)

    assert mask.ndim == 2
    assert np.all(0 <= mask) and np.all(mask < args.classes)

    probs = np.eye(args.classes, dtype=np.float32)[mask]  # one-hot (H, W, C)

    primitive_indices, _ = renderer.render(
        colmap_workspace.getCamera(mask_file)
    )
    aggregator.add(primitive_indices, probs.transpose(1, 0, 2))

if args.remap:
    from semantic_meshes.utils import palette_from_color_map

    class_to_color = palette_from_color_map(color_to_class, args.classes)
    print(
        f"Remapped {len(color_to_class)} distinct mask colors: "
        f"{[class_to_color[c].tolist() for c in sorted(color_to_class.values())]}"
    )
else:
    from semantic_meshes.utils import class_palette

    class_to_color = class_palette(args.classes)
    print(f"Using a generated {args.classes}-color palette")

print("Assigning face colors")
primitive_annotations = np.asarray(aggregator.get())
dont_care_threshold = 0.9
without_annotations = (
    primitive_annotations.sum(-1) < dont_care_threshold
)
# the mul aggregator's never-touched rows normalize to a uniform
# distribution (sum exactly 1), which would slip past the threshold and
# paint unseen faces class 0; the raw accumulator is zero iff untouched
without_annotations |= ~np.any(
    np.asarray(aggregator.state) != 0.0, axis=1
)

classes = primitive_annotations.argmax(-1)
primitive_colors = class_to_color[classes]
primitive_colors = np.where(
    without_annotations[:, None], np.uint8(0), primitive_colors
)

print(f"Writing {args.output_ply}")
mesh.save(args.output_ply, primitive_colors)
