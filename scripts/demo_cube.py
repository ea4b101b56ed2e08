#!/usr/bin/env python3
"""Self-contained demo: synthesize the BASELINE cube scene, fuse one-hot
masks from 6 ring views, and write visual artifacts:

  out/cube_colorized.ply       colorized mesh (triangle mode)
  out/cube_texels.ply          input mesh (texel stats printed)
  out/view{k}_annotation.png   re-rendered fused annotations per view
  out/view{k}_depth.png        depth renders

Run: python scripts/demo_cube.py --out demo_out [--views 6] [--size 512]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402
from semantic_meshes import testing  # noqa: E402
from semantic_meshes.io.ply import write_mesh  # noqa: E402
from semantic_meshes.utils import class_palette  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--out", type=str, default="demo_out")
parser.add_argument("--views", type=int, default=6)
parser.add_argument("--size", type=int, default=512)
parser.add_argument("--subdivisions", type=int, default=9)
parser.add_argument("--aggregator", type=str, default="sum",
                    choices=["sum", "summax", "mul"])
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402

os.makedirs(args.out, exist_ok=True)
W = H = args.size

print("Building cube scene...")
vertices, faces = testing.make_cube(args.subdivisions)
mesh_path = os.path.join(args.out, "cube.ply")
write_mesh(mesh_path, vertices, faces)
mesh = semantic_meshes.data.Ply(mesh_path)
cams = testing.make_ring_cameras(num_views=args.views, width=W, height=H)

renderer = semantic_meshes.render.triangles(mesh)
T = renderer.getPrimitivesNum()
C = 6
tri_class = (np.arange(T) // (T // 6)).clip(max=C - 1)
palette = class_palette(C)

aggregator = semantic_meshes.fusion.MeshAggregator(
    primitives=T, classes=C, aggregator=args.aggregator
)

print(f"Fusing {args.views} views...")
for k, cam in enumerate(cams):
    idx, depth = renderer.render(cam)
    idx_hw = np.asarray(idx).T
    covered = idx_hw != 0xFFFFFFFF
    mask = np.zeros(idx_hw.shape, np.int64)
    mask[covered] = tri_class[idx_hw[covered].astype(np.int64)]
    probs = np.eye(C, dtype=np.float32)[mask]
    probs[~covered] = 0.0
    aggregator.add(idx, probs.transpose(1, 0, 2))

    d = np.asarray(depth).T
    d = np.where(np.isfinite(d), d, np.nan)
    lo, hi = np.nanmin(d), np.nanmax(d)
    img = np.where(
        np.isnan(d), 0, (255 * (1 - (d - lo) / max(hi - lo, 1e-6)))
    ).astype(np.uint8)
    imageio.imwrite(os.path.join(args.out, f"view{k}_depth.png"), img)

print("Saving colorized mesh...")
fused = np.asarray(aggregator.get())
seen = fused.sum(-1) >= 0.5
colors = palette[fused.argmax(-1)]
colors[~seen] = 0
mesh.save(os.path.join(args.out, "cube_colorized.ply"), colors)

print("Re-rendering fused annotations...")
model_renderer = aggregator.renderer()
for k, cam in enumerate(cams):
    idx, _ = renderer.render(cam)
    ann = np.asarray(model_renderer.render(np.asarray(idx).T))
    img = palette[ann.argmax(-1)]
    img[ann.sum(-1) < 0.5] = 255  # background white
    imageio.imwrite(
        os.path.join(args.out, f"view{k}_annotation.png"), img.astype(np.uint8)
    )

print("Texel-mode stats...")
tex = semantic_meshes.render.texels(mesh, cams, 0.2)
print(
    f"triangles={T}, texels={tex.getPrimitivesNum()}, "
    f"views={args.views}, out={args.out}"
)
print("Done.")
