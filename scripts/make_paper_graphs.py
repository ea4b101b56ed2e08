#!/usr/bin/env python3
"""Reproduce the paper's evaluation figures end-to-end from THIS framework.

The reference's figure pipeline is eval_scannet.py -> result YAMLs ->
create_scannet_eval_graphs.py (ref: eval-scannet/create_scannet_eval_graphs.py
:117-250, producing texelres_to_accuracy.png, imagesequalweight_to_accuracy
.png, simplify_to_accuracy.png, framesstep_to_accuracy.png, aggregators.csv).
That needs the ScanNet dataset, which cannot be shipped — this script runs
the SAME composition on synthetic scenes with seeded noisy predictions
(testing.build_synthetic_scannet_scene(prob_noise=...): later frames are
noisier, so per-image vs per-pixel weighting and the aggregator choice
genuinely move the fused accuracy), demonstrating every L4 stage wired
together without any dataset mount.

    python scripts/make_paper_graphs.py --out /tmp/paper_graphs

Writes <out>/results/*.yaml plus the four plots and aggregators.csv into
<out>/results/. Runs anywhere the test suite runs (CPU ok); on a real
ScanNet mount use eval_scannet.py + create_scannet_eval_graphs.py directly.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


SIMPLIFY_FACTORS = ("0.25", "0.0625")


def grid_points(grid):
    """Eval parameter grid -> list of eval_scannet.py arg dicts.

    The "full" grid covers every predicate of the four plots + the
    aggregator CSV (create_scannet_eval_graphs.py:156-300): aggregator x
    weight for the table, a weight sweep, a texel-resolution sweep, a
    frames-step point, and the simplification sweep (2 factors x
    {triangles, texels gamma=0.2} — the scene builder writes genuinely
    coarser meshes under the simplified-mesh names, so the simplify plot
    carries real multi-point curves without meshlabserver). "smoke" is
    the 3-run subset the test uses.
    """
    points = []
    if grid == "smoke":
        for agg in ("sum", "mul"):
            points.append({"aggregator": agg, "images_equal_weight": 1.0})
        points.append({
            "aggregator": "mul", "images_equal_weight": 1.0,
            "mode": "texels", "texel_resolution": 0.1,
        })
        return points
    for agg in ("sum", "summax", "mul"):
        for w in (0.0, 1.0):
            points.append({"aggregator": agg, "images_equal_weight": w})
    points.append({"aggregator": "mul", "images_equal_weight": 0.5})
    for tex in (0.05, 0.1, 0.2):
        points.append({
            "aggregator": "mul", "images_equal_weight": 1.0,
            "mode": "texels", "texel_resolution": tex,
        })
    points.append({
        "aggregator": "mul", "images_equal_weight": 1.0, "frames_step": 2,
    })
    for factor in SIMPLIFY_FACTORS:
        points.append({
            "aggregator": "mul", "images_equal_weight": 1.0,
            "simplify": factor,
        })
        points.append({
            "aggregator": "mul", "images_equal_weight": 1.0,
            "simplify": factor,
            "mode": "texels", "texel_resolution": 0.2,
        })
    return points


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--subdivisions", type=int, default=6)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--noise", type=float, default=0.6,
                    help="max per-frame label-flip probability (frame i "
                         "gets noise * i / (views - 1))")
    ap.add_argument("--grid", default="full", choices=("full", "smoke"))
    args = ap.parse_args()

    import json
    import shutil

    from semantic_meshes import testing

    root = os.path.join(args.out, "scannet")
    results = os.path.join(args.out, "results")
    os.makedirs(os.path.join(root, "scans"), exist_ok=True)
    os.makedirs(results, exist_ok=True)
    testing.write_scannet_label_tsv(
        os.path.join(root, "scannetv2-labels.combined.tsv")
    )
    build_params = {
        "scenes": args.scenes,
        "subdivisions": args.subdivisions, "views": args.views,
        "width": args.width, "height": args.height, "noise": args.noise,
        "grid": args.grid,
    }
    # results are derived data: eval_scannet.py skips grid points whose
    # params match an existing YAML (and noise/scene shape is NOT in those
    # params), so results from a previous run with different build flags
    # would be silently reused — clear them on any parameter change
    results_marker = os.path.join(results, ".sm_build_params.json")
    stale = True
    if os.path.isfile(results_marker):
        with open(results_marker) as f:
            stale = json.load(f) != build_params
    if stale:
        for f in os.listdir(results):
            if f.endswith((".yaml", ".png", ".csv")):
                os.remove(os.path.join(results, f))
        with open(results_marker, "w") as f:
            json.dump(build_params, f)
    for i in range(args.scenes):
        name = f"scene{i:04d}_00"
        scene_dir = os.path.join(root, "scans", name)
        marker = os.path.join(scene_dir, ".sm_synthetic_build.json")
        # resume only on a COMPLETE scene built with the SAME parameters
        # (the marker is written last); a bare directory may be a partial
        # build or carry stale flags — rebuild it
        if os.path.isfile(marker):
            with open(marker) as f:
                if json.load(f) == build_params:
                    continue
        if os.path.isdir(scene_dir):
            print(f"Rebuilding stale/partial scene {name} ...")
            shutil.rmtree(scene_dir)
            shutil.rmtree(os.path.join(root, "probs", name),
                          ignore_errors=True)
        else:
            print(f"Building synthetic scene {name} ...")
        testing.build_synthetic_scannet_scene(
            root, name,
            subdivisions=args.subdivisions, num_views=args.views,
            width=args.width, height=args.height,
            prob_noise=args.noise, noise_seed=i,
            simplify_factors=(
                SIMPLIFY_FACTORS if args.grid == "full" else ()
            ),
        )
        with open(marker, "w") as f:
            json.dump(build_params, f)

    points = grid_points(args.grid)
    for k, point in enumerate(points):
        print(f"[{k + 1}/{len(points)}] eval {point}")
        cmd = [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", root,
            "--model", "probs",
            "--probs_dir", os.path.join(root, "probs"),
            "--output", results,
        ]
        for key, value in point.items():
            cmd += [f"--{key}", str(value)]
        subprocess.run(cmd, check=True)

    print("Creating plots ...")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet",
                         "create_scannet_eval_graphs.py"),
            "--path", results,
            "--min_scenes", "1",  # synthetic runs cover < 100 scenes
        ],
        check=True,
    )
    made = sorted(
        f for f in os.listdir(results)
        if f.endswith((".png", ".csv"))
    )
    print(f"Done. Artifacts in {results}: {', '.join(made)}")


if __name__ == "__main__":
    main()
