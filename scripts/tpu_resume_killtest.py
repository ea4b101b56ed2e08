#!/usr/bin/env python3
"""On-device checkpoint-resume kill test (VERDICT r3 item 6).

Runs eval-scannet/eval_scannet.py on the REAL chip (children inherit the
environment's default platform, e.g. the tunneled axon TPU), SIGKILLs it
mid-scene the moment the first checkpoint manifest lands, resumes to
completion, and asserts exact metric parity with an uninterrupted run.
This is the hardware leg of tests/test_eval_scannet.py::
test_eval_checkpoint_sigkill_resume (which runs CPU children inside the
suite, where the pytest process already holds the chip).

The parent pins ITSELF to CPU (scene building only) so the chip is free
for the children. Prints one JSON line with timings + PASS/FAIL.

Usage: python scripts/tpu_resume_killtest.py [--workdir DIR]
       [--subdivisions N] [--views N] [--width W] [--height H]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("SM_PLATFORM", "cpu")  # parent: scene building only

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--subdivisions", type=int, default=8)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--cpu", action="store_true",
                    help="run the eval children on CPU too (smoke mode)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from semantic_meshes import testing

    work = args.workdir or tempfile.mkdtemp(prefix="sm_killtest_")
    root = os.path.join(work, "scannet")
    for i in range(2):
        testing.build_synthetic_scannet_scene(
            root, f"scene{i:04d}_00", subdivisions=args.subdivisions,
            num_views=args.views, width=args.width, height=args.height,
        )
    testing.write_scannet_label_tsv(
        os.path.join(root, "scannetv2-labels.combined.tsv")
    )

    child_env = dict(os.environ)
    if args.cpu:
        child_env["SM_PLATFORM"] = "cpu"
        child_env["JAX_PLATFORMS"] = "cpu"
    else:
        child_env.pop("SM_PLATFORM", None)  # children: env default (TPU)
    child_env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sm_xla")
    )

    def cmd(out, extra):
        return [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "eval_scannet.py"),
            "--scannet", root,
            "--model", "probs",
            "--probs_dir", os.path.join(root, "probs"),
            "--aggregator", "sum",
            "--output", out,
        ] + extra

    # uninterrupted reference
    t0 = time.time()
    ref_out = os.path.join(work, "ref")
    proc = subprocess.run(
        cmd(ref_out, []), env=child_env, capture_output=True, text=True,
        timeout=args.timeout,
    )
    t_ref = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout + proc.stderr, file=sys.stderr)
        print(json.dumps({"killtest": "FAIL", "stage": "reference run"}))
        sys.exit(1)

    # killed run
    ck = os.path.join(work, "ckpt")
    out = os.path.join(work, "resumed")
    child = subprocess.Popen(
        cmd(out, ["--checkpoint", ck, "--checkpoint_every", "2"]),
        env=child_env, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    manifest = os.path.join(ck, "manifest.npz")
    deadline = time.time() + args.timeout
    killed_at = None
    try:
        while not os.path.isfile(manifest):
            if child.poll() is not None:
                print(json.dumps({
                    "killtest": "FAIL",
                    "stage": f"eval exited rc={child.returncode} before "
                             "first checkpoint",
                }))
                sys.exit(1)
            if time.time() > deadline:
                print(json.dumps(
                    {"killtest": "FAIL", "stage": "checkpoint timeout"}
                ))
                sys.exit(1)
            time.sleep(0.05)
        child.send_signal(signal.SIGKILL)
        killed_at = time.time()
        child.wait(timeout=120)
    finally:
        if child.poll() is None:
            child.kill()

    # resume to completion
    t1 = time.time()
    proc = subprocess.run(
        cmd(out, ["--checkpoint", ck, "--checkpoint_every", "2"]),
        env=child_env, capture_output=True, text=True,
        timeout=args.timeout,
    )
    t_resume = time.time() - t1
    if proc.returncode != 0 or "Resuming" not in proc.stdout:
        print(proc.stdout + proc.stderr, file=sys.stderr)
        print(json.dumps({"killtest": "FAIL", "stage": "resume run"}))
        sys.exit(1)

    import yaml

    with open(os.path.join(ref_out, "run-1.yaml")) as f:
        ref = yaml.safe_load(f)
    with open(os.path.join(out, "run-1.yaml")) as f:
        got = yaml.safe_load(f)

    import numpy as np

    mismatches = []
    for group in ("vertex", "image_network", "image_fused"):
        for key in ("accuracy", "mean_iou"):
            if abs(got["metrics"][group][key]
                   - ref["metrics"][group][key]) > 1e-6:
                mismatches.append(f"{group}.{key}")
        if not np.allclose(
            np.asarray(got["metrics"][group]["confusion_matrix"]),
            np.asarray(ref["metrics"][group]["confusion_matrix"]),
            atol=1e-3,
        ):
            mismatches.append(f"{group}.confusion_matrix")

    result = {
        "killtest": "PASS" if not mismatches else "FAIL",
        "mismatches": mismatches,
        "device_backend": "cpu (smoke)" if args.cpu
                          else "environment default (children)",
        "reference_run_s": round(t_ref, 1),
        "resume_run_s": round(t_resume, 1),
        "killed_after_s": round(killed_at - t0 - t_ref, 1),
        "scenes": 2,
        "views_per_scene": args.views,
        "resolution": [args.width, args.height],
        "workdir": work,
    }
    print(json.dumps(result))
    sys.exit(0 if not mismatches else 1)


if __name__ == "__main__":
    main()
