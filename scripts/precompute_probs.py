#!/usr/bin/env python3
"""Precompute per-image class-probability maps (.npy) for the fusion
pipelines (the --probs backends of colorize_cityscapes_mesh.py and
eval-scannet/eval_scannet.py --model probs).

Decouples segmentation inference from fusion, mirroring the reference's
intended workflow where the 2D model is external (ref: README.md:24-29
step 2 "Run a 2D segmentation model on the images (externally)").
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser(
    description="Precompute (H, W, classes) probability maps for a folder "
    "of images"
)
parser.add_argument("--images", type=str, required=True)
parser.add_argument("--out", type=str, required=True)
parser.add_argument("--classes", type=int, default=19)
parser.add_argument("--arch", type=str, default="unet",
                    choices=["unet", "pspnet"])
parser.add_argument("--params", type=str, default=None,
                    help="flax msgpack checkpoint")
parser.add_argument("--dtype", type=str, default="float16",
                    help="storage dtype for the .npy maps")
args = parser.parse_args()

import imageio.v2 as imageio  # noqa: E402
from tqdm import tqdm  # noqa: E402

from semantic_meshes.models import segmentation  # noqa: E402

predict = segmentation.load_predictor(
    classes=args.classes, params_path=args.params, arch=args.arch
)
os.makedirs(args.out, exist_ok=True)

files = sorted(
    f for f in os.listdir(args.images)
    if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".tiff"))
)
for name in tqdm(files):
    image = imageio.imread(os.path.join(args.images, name))
    probs = np.asarray(predict(image)).astype(args.dtype)
    base = os.path.splitext(name)[0]
    np.save(os.path.join(args.out, base + ".npy"), probs)
print(f"Wrote {len(files)} probability maps to {args.out}")
