#!/usr/bin/env python3
"""Reproducible end-to-end eval benchmark (the docs/PERFORMANCE.md
"End-to-end ScanNet-eval timing" scene).

Builds a synthetic 43k-face ScanNet scene (subdivided cube, ring cameras,
posed .sens frames) and times `eval-scannet/eval_scannet.py` over it on
the current default device. Frame rate = frames / fusion-loop wall time
as reported by the eval's --timings phase timers; steady-state excludes
the first (compiling) frame by using enough frames to amortize.

Usage: python scripts/bench_eval.py [--subdivisions 60] [--frames 40]
           [--width 1296] [--height 968] [--model jax-unet|probs]
           [--scenes 1] [--graphs]

--scenes N builds an N-scene sweep (slightly varied mesh sizes — the
eval's size bucketing keeps them on shared compiled programs) and the
eval aggregates metrics across all of them; --graphs then runs
eval-scannet/create_scannet_eval_graphs.py over the result YAMLs,
demonstrating the full sweep -> YAML -> paper-plots pipeline on the
current device (ref: eval-scannet/create_scannet_eval_graphs.py).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

# the parent only builds the scene (numpy); pin it to CPU so the chip is
# free for the timed child (same pattern as scripts/tpu_resume_killtest.py
# — the tunneled TPU is single-tenant)
_user_platform = os.environ.get("SM_PLATFORM")
os.environ.setdefault("SM_PLATFORM", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=60)  # 43200 faces
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--width", type=int, default=1296)
    ap.add_argument("--height", type=int, default=968)
    ap.add_argument("--model", default="jax-unet",
                    choices=["jax-unet", "probs"])
    ap.add_argument("--probs_dtype", default="f16",
                    choices=["f32", "f16", "bf16"],
                    help="With --model probs: wire dtype for the prob-map "
                    "upload (f16 default — the upload dominates e2e time "
                    "on a tunneled device; pass f32 for the exact-wire "
                    "variant)")
    ap.add_argument("--aggregator", default="mul")
    ap.add_argument("--texels", action="store_true")
    ap.add_argument("--scenes", type=int, default=1)
    ap.add_argument("--graphs", action="store_true",
                    help="run create_scannet_eval_graphs.py on the "
                         "result YAMLs afterwards")
    ap.add_argument("--keep", help="directory to build the scene in "
                                   "(reused if it already exists)")
    args = ap.parse_args()

    from semantic_meshes import testing

    root = args.keep or tempfile.mkdtemp(prefix="sm_bench_eval_")
    built = []
    for s in range(args.scenes):
        name = f"scene{s:04d}_00"
        scene_sens = os.path.join(root, "scans", name, f"{name}.sens")
        if os.path.exists(scene_sens):
            continue
        os.makedirs(os.path.join(root, "scans"), exist_ok=True)
        testing.write_scannet_label_tsv(
            os.path.join(root, "scannetv2-labels.combined.tsv"))
        t0 = time.perf_counter()
        # vary mesh sizes across the sweep (within one size bucket's
        # reach, so the eval's bucketing shares compiled programs) and
        # make later scenes' predictions noisier so the fused-vs-network
        # delta in the graphs is non-degenerate
        faces, views = testing.build_synthetic_scannet_scene(
            root, name, subdivisions=args.subdivisions + 2 * s,
            num_views=args.frames, width=args.width, height=args.height,
            write_probs=(args.model == "probs"),
            prob_noise=0.2 if args.model == "probs" else 0.0,
            noise_seed=s,
        )
        built.append({"scene": name, "faces": faces, "frames": views,
                      "seconds": round(time.perf_counter() - t0, 1)})
    if built:
        print(json.dumps({"scenes_built": built}), flush=True)

    out = os.path.join(root, "results")
    cmd = [
        sys.executable, os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
        "--scannet", root,
        "--model", args.model,
        "--aggregator", args.aggregator,
        "--output", out,
        "--timings",
    ]
    if args.model == "probs":
        cmd += ["--probs_dir", os.path.join(root, "probs"),
                "--probs_dtype", args.probs_dtype]
    if args.texels:
        cmd += ["--mode", "texels"]
    env = dict(os.environ)
    if _user_platform is None:
        env.pop("SM_PLATFORM", None)  # child: environment default (TPU)
    env.setdefault("SM_COMPILE_CACHE",
                   os.path.expanduser("~/.cache/sm_xla"))
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
    if proc.returncode != 0:
        raise SystemExit(f"eval failed rc={proc.returncode}")

    # PhaseTimers lines:
    #   "  <name>: 1.234s (N calls, X ms/call, Y ms median)"
    # the median is the steady-state number (first calls carry the
    # 30-130 s tunneled XLA compiles; at typical frame counts they
    # dominate the mean)
    m = re.findall(
        r"^\s+([\w/ .-]+): ([0-9.]+)s \((\d+) calls, ([0-9.]+) ms/call"
        r"(?:, ([0-9.]+) ms median)?\)",
        proc.stdout, re.M,
    )
    timers = {k: {"total_s": float(t), "calls": int(n),
                  "ms_per_call": float(ms),
                  **({"ms_median": float(med)} if med else {})}
              for k, t, n, ms, med in m}
    steady_ms = sum(v.get("ms_median", v["ms_per_call"])
                    for v in timers.values())
    result = {
        "metric": "eval_e2e",
        "scenes": args.scenes,
        "frames": args.frames,
        "model": args.model,
        "aggregator": args.aggregator,
        **({"probs_dtype": args.probs_dtype}
           if args.model == "probs" else {}),
        "total_wall_s": round(wall, 1),
        "steady_ms_per_frame": round(steady_ms, 1),
        "timers": timers,
    }

    if args.graphs:
        t0 = time.perf_counter()
        gproc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "eval-scannet",
                          "create_scannet_eval_graphs.py"),
             "--path", out, "--min_scenes", "1"],
            env=env, capture_output=True, text=True,
        )
        if gproc.returncode != 0:
            sys.stderr.write(gproc.stdout + gproc.stderr)
            raise SystemExit(f"graphs failed rc={gproc.returncode}")
        result["graphs"] = {
            "seconds": round(time.perf_counter() - t0, 1),
            "files": sorted(f for f in os.listdir(out)
                            if f.endswith((".png", ".csv"))),
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
