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
                    choices=["float32", "float16", "uint8"],
                    help="storage dtype for the .npy maps; uint8 stores "
                    "rint(p*255) (<=1/510 abs error per class) at half "
                    "the bytes of float16 — the fusion loaders dequantize "
                    "on device. Restricted to the dtypes probs_io's "
                    "loaders understand: any other integer dtype would "
                    "store quantized maps the loaders read back as raw "
                    "0..max 'probabilities' (ADVICE r4)")
parser.add_argument("--topk", type=int, default=None,
                    help="store only the K most probable classes per pixel "
                    "as a compressed .npz {values, indices} instead of the "
                    "dense map (values in --dtype, indices uint8). A "
                    "2048x1024x19 map shrinks 80 MB (f16) -> ~25 MB at "
                    "K=6; dropped mass is bounded by the (K+1)-th "
                    "probability per pixel. Loaders rebuild the dense map "
                    "on device")
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
def store(probs, dtype):
    """Cast for storage; integer dtypes quantize p in [0,1] to the full
    integer range (plain astype would truncate everything to 0)."""
    dt = np.dtype(dtype)
    if np.issubdtype(dt, np.integer):
        scale = float(np.iinfo(dt).max)
        return np.rint(probs.astype(np.float32) * scale).astype(dt)
    return probs.astype(dt)


for name in tqdm(files):
    image = imageio.imread(os.path.join(args.images, name))
    probs = np.asarray(predict(image))
    base = os.path.splitext(name)[0]
    if args.topk is not None:
        k = args.topk
        if not 0 < k <= probs.shape[-1] or probs.shape[-1] > 255:
            raise SystemExit(
                f"--topk {k} invalid for {probs.shape[-1]} classes"
            )
        # descending top-k per pixel (argpartition + local sort: O(C+k log k))
        part = np.argpartition(probs, -k, axis=-1)[..., -k:]
        vals = np.take_along_axis(probs, part, axis=-1)
        order = np.argsort(-vals, axis=-1)
        idx = np.take_along_axis(part, order, axis=-1).astype(np.uint8)
        vals = np.take_along_axis(vals, order, axis=-1)
        np.savez(
            os.path.join(args.out, base + ".npz"),
            values=store(vals, args.dtype), indices=idx,
            classes=np.int32(probs.shape[-1]),
        )
    else:
        np.save(os.path.join(args.out, base + ".npy"),
                store(probs, args.dtype))
print(f"Wrote {len(files)} probability maps to {args.out}")
