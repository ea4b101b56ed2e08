#!/usr/bin/env python3
"""Re-render fused mesh annotations as consistent per-view 2D images.

The paper's second output mode: after fusing per-view predictions into the
mesh, render the fused per-primitive class distributions back through every
camera — producing label images that are multi-view CONSISTENT by
construction (each pixel reads the same fused distribution its primitive
got from all views). The reference only does this inside its eval loop via
tf.gather (ref: eval-scannet/eval_scannet.py:300-316) and never exposes a
script or the underlying ModelRenderer binding (ref:
include/semantic_meshes/fusion/Mesh.h:10-43, unbound at
python/semantic_meshes/src/Fusion.cu:17-20); here both are first-class.

Inputs mirror colorize_mesh.py (same mask -> fuse pipeline, ref:
python/scripts/colorize_mesh.py:1-92), or skip fusion entirely by passing
--fused_npz from a previous run. Outputs per view:

  <output_dir>/labels/<image>.png  uint8 class ids (255 = background /
                                   don't-care, like the eval's ignore id)
  <output_dir>/color/<image>.png   palette-colorized annotation image

plus optionally the fused per-primitive distributions (--save_fused) for
reuse.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402

parser = argparse.ArgumentParser(
    description="Fuse 2D masks into a mesh (or load fused distributions) "
    "and re-render consistent per-view annotation images."
)
parser.add_argument("--colmap", type=str, required=True,
                    help="COLMAP workspace directory")
parser.add_argument("--input_ply", type=str, required=True,
                    help="Mesh the workspace reconstructs (PLY)")
parser.add_argument("--classes", type=int, required=True)
parser.add_argument("--output_dir", type=str, required=True)
parser.add_argument("--masks", type=str, default=None,
                    help="Directory of per-view mask images (named like the "
                    "COLMAP image entries); required unless --fused_npz "
                    "points at an existing file")
parser.add_argument("--fused_npz", type=str, default=None,
                    help="Load fused per-primitive distributions from this "
                    ".npz (key 'fused') instead of fusing masks")
parser.add_argument("--save_fused", type=str, default=None,
                    help="Also write the fused per-primitive distributions "
                    "to this .npz (key 'fused')")
parser.add_argument("--remap", action="store_true",
                    help="Treat masks as color images; assign each distinct "
                    "color a class index on first sight (colorize_mesh.py "
                    "semantics)")
parser.add_argument("--aggregator", type=str, default="sum",
                    choices=["sum", "summax", "mul"])
parser.add_argument("--images_equal_weight", type=float, default=0.5)
parser.add_argument("--texels_per_pixel", type=float, default=None,
                    help="Render/fuse in texel mode at this resolution "
                    "factor (default: triangle mode)")
parser.add_argument("--clip_near", action="store_true")
parser.add_argument("--dont_care_threshold", type=float, default=0.5,
                    help="Primitives whose fused mass is at or below this "
                    "render as unlabeled (the fusion don't-care rule, ref: "
                    "include/semantic_meshes/fusion/Mesh.h:98)")
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402
from tqdm import tqdm  # noqa: E402

from semantic_meshes.utils import (  # noqa: E402
    class_palette, palette_from_color_map, remap_mask_colors,
)

print("Loading mesh + COLMAP workspace")
mesh = semantic_meshes.data.Ply(args.input_ply)
workspace = semantic_meshes.data.Colmap(args.colmap)
view_names = [workspace.getImageName(i)
              for i in range(workspace.getImageNum())]
all_cams = [workspace.getCamera(n) for n in view_names]

if args.texels_per_pixel is not None:
    renderer = semantic_meshes.render.texels(
        mesh, all_cams, args.texels_per_pixel, clip_near=args.clip_near
    )
else:
    renderer = semantic_meshes.render.triangles(
        mesh, clip_near=args.clip_near
    )
P = renderer.getPrimitivesNum()
renderer.prepare(all_cams)  # one budget probe; no mid-loop recompiles

color_to_class = {}


def _mask_to_probs(path):
    m = imageio.imread(path)
    if args.remap:
        cls = remap_mask_colors(m, color_to_class)
    else:
        cls = m if m.ndim == 2 else m[..., 0]
    if cls.max() >= args.classes:
        raise SystemExit(
            f"{path}: mask class {cls.max()} >= --classes {args.classes}"
        )
    return np.eye(args.classes, dtype=np.float32)[cls]  # (H, W, C)


if args.fused_npz and os.path.exists(args.fused_npz):
    print(f"Loading fused distributions from {args.fused_npz}")
    fused = np.load(args.fused_npz)["fused"]
    if fused.shape != (P, args.classes):
        raise SystemExit(
            f"{args.fused_npz}: fused shape {fused.shape} does not match "
            f"(primitives, classes) = ({P}, {args.classes})"
        )
else:
    if not args.masks:
        raise SystemExit("--masks is required unless --fused_npz exists")
    aggregator = semantic_meshes.fusion.MeshAggregator(
        primitives=P, classes=args.classes, aggregator=args.aggregator,
        images_equal_weight=args.images_equal_weight,
    )
    # masks are matched by workspace-relative stem (COLMAP image names may
    # be nested, e.g. 'cam0/000123.jpg'), with the flat basename as a
    # fallback for flat mask directories
    mask_files = {}
    for dirpath, _dirs, files in os.walk(args.masks):
        for fn in files:
            if not fn.lower().endswith(
                (".png", ".jpg", ".jpeg", ".tiff", ".bmp")
            ):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, args.masks)
            mask_files[os.path.splitext(rel)[0]] = full
            mask_files.setdefault(os.path.splitext(fn)[0], full)
    print(f"Fusing masks for {len(view_names)} views ({args.aggregator})")
    for name in tqdm(view_names):
        stem = os.path.splitext(name)[0]
        if stem not in mask_files:
            stem = os.path.splitext(os.path.basename(name))[0]
        if stem not in mask_files:
            continue
        probs = _mask_to_probs(mask_files[stem])
        idx, _ = renderer.render(workspace.getCamera(name))
        aggregator.add(idx, probs.transpose(1, 0, 2))
    fused = np.asarray(aggregator.get())  # (P, C), L1-normalized
    # never-observed primitives must stay don't-care: the mul
    # aggregator's untouched (all-zero log-space) rows normalize to a
    # UNIFORM distribution with sum 1 > any threshold, which would label
    # them class 0. The raw accumulator is exactly zero iff untouched —
    # zero those fused rows (also fixes the --save_fused reuse path).
    observed = np.any(np.asarray(aggregator.state) != 0.0, axis=1)
    fused = np.where(observed[:, None], fused, 0.0)

if args.save_fused:
    np.savez_compressed(args.save_fused, fused=fused)
    print(f"Wrote fused distributions to {args.save_fused}")

if args.remap and color_to_class:
    palette = palette_from_color_map(color_to_class, args.classes)
else:
    palette = class_palette(args.classes)

os.makedirs(os.path.join(args.output_dir, "labels"), exist_ok=True)
os.makedirs(os.path.join(args.output_dir, "color"), exist_ok=True)

# per-primitive class + labeled mask once; per view it is ONE coherent
# gather through the first-class ModelRenderer API (the fast path —
# gathers from rendered index images ride spatial coherence)
model_renderer = semantic_meshes.fusion.ModelRenderer(fused)

print(f"Rendering {len(view_names)} annotation views")
for name in tqdm(view_names):
    idx, _ = renderer.render(workspace.getCamera(name))
    probs_img = np.asarray(model_renderer.render(idx))  # (W, H, C)
    probs_img = probs_img.transpose(1, 0, 2)  # (H, W, C)
    labeled = probs_img.sum(-1) > args.dont_care_threshold
    cls = probs_img.argmax(-1).astype(np.uint8)
    labels = np.where(labeled, cls, np.uint8(255))
    color = np.where(
        labeled[..., None], palette[cls], np.uint8(0)
    )
    stem = os.path.splitext(name)[0]
    lab_path = os.path.join(args.output_dir, "labels", stem + ".png")
    col_path = os.path.join(args.output_dir, "color", stem + ".png")
    # nested COLMAP image names ('cam0/000123.jpg') keep their structure
    os.makedirs(os.path.dirname(lab_path), exist_ok=True)
    os.makedirs(os.path.dirname(col_path), exist_ok=True)
    imageio.imwrite(lab_path, labels)
    imageio.imwrite(col_path, color)
print(f"Wrote {args.output_dir}/labels and {args.output_dir}/color")
