#!/usr/bin/env python3
"""Render texels on a single triangle for all 6 vertex orderings; save PNGs.

Port of the reference's manual/visual renderer harness
(ref: python/scripts/debug_render_texels.py:1-98) — the same scenario also
runs as an assertion-based test in tests/test_texels.py.
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import semantic_meshes  # noqa: E402
from semantic_meshes.geometry import look_at  # noqa: E402
from semantic_meshes.io.ply import write_mesh  # noqa: E402

parser = argparse.ArgumentParser(
    description="Visual texel-renderer harness: one triangle, all 6 vertex "
    "orderings, depth + checkerboard texel PNGs"
)
parser.add_argument("--output", type=str, required=True,
                    help="Directory to write the PNG/PLY outputs into")
parser.add_argument("--size", type=int, default=1000,
                    help="Image sidelength (reference used 4000)")
parser.add_argument("--texels_per_pixel", type=float, default=0.04)
args = parser.parse_args()

os.makedirs(args.output, exist_ok=True)

import imageio.v2 as imageio  # noqa: E402

vertex = np.array(
    [(0.4, 0, 0), (0.5, 1, 0), (0.6, 0, 0)], np.float32
)

for order in [[0, 1, 2], [0, 2, 1], [1, 0, 2], [1, 2, 0], [2, 0, 1], [2, 1, 0]]:
    name = "-".join(str(s) for s in order)
    mesh_file = os.path.join(args.output, f"mesh-{name}.ply")
    write_mesh(mesh_file, vertex, np.asarray([order], np.int32),
               binary=False)
    mesh = semantic_meshes.data.Ply(mesh_file)

    # camera at (-0.5, -0.5, 4) looking at (-0.5, -0.5, 0): the renderer's
    # convention looks down +z, so flip to look toward -z via look_at
    rotation, translation = look_at(
        [-0.5, -0.5, 4.0], [-0.5, -0.5, 0.0], [0.0, 1.0, 0.0]
    )
    resolution = np.asarray([args.size, args.size])
    principal_point = resolution.astype("float32") / 2.0
    fov_y = math.radians(45.0)
    focal_lengths = np.asarray(
        [
            principal_point[0]
            / (resolution[0] / resolution[1] * math.tan(fov_y / 2.0)),
            principal_point[1] / math.tan(fov_y / 2.0),
        ]
    )
    camera = semantic_meshes.data.Camera(
        rotation, translation, np.asarray([resolution[1], resolution[0]]),
        focal_lengths, principal_point,
    )

    renderer = semantic_meshes.render.texels(
        mesh, [camera], args.texels_per_pixel
    )
    primitive_indices, depth = renderer.render(camera)
    depth = np.asarray(depth).T
    primitive_indices = np.asarray(primitive_indices).T.astype(np.int64)
    primitive_indices[primitive_indices == 0xFFFFFFFF] = -1

    classes_num = int(primitive_indices.max() + 1)
    sidelength = int(-0.5 + math.sqrt(0.25 + 2 * classes_num))
    print(f"Has {classes_num} texels and sidelength {sidelength}")
    primitive_indices = np.where(
        primitive_indices >= 0, primitive_indices, classes_num
    )

    depth_img = np.where(np.isinf(depth), 0.0, depth)
    imageio.imwrite(
        os.path.join(args.output, f"depth-{name}.png"),
        (depth_img / max(depth_img.max(), 1e-6) * 255).astype(np.uint8),
    )

    # Two-tone checkerboard over the triangular texel grid, closed form:
    # texel k lives in row r = floor((sqrt(8k+1)-1)/2) of the
    # lower-triangular row-major layout at column c = k - r(r+1)/2
    # (the inverse of the s(s+1)/2 count identity); tone = (r+c) parity.
    k = np.arange(classes_num, dtype=np.int64)
    row = ((np.sqrt(8.0 * k + 1.0) - 1.0) / 2.0).astype(np.int64)
    col = k - row * (row + 1) // 2
    tones = np.array([[255, 201, 14], [0, 162, 232]], np.uint8)
    palette = np.concatenate(
        [tones[(row + col) % 2], np.full((1, 3), 255, np.uint8)]
    )  # last row: white background
    imageio.imwrite(
        os.path.join(args.output, f"color-{name}.png"),
        palette[primitive_indices],
    )
