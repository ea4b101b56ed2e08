"""create_scannet_eval_graphs.py end-to-end: merge, drop, plots, CSV."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C = 40


def _run_yaml(params, accuracy, seed=0):
    rng = np.random.default_rng(seed)
    cm = np.zeros((C, C))
    # diagonal mass tuned to the requested accuracy
    total = 1000
    correct = int(total * accuracy)
    cm[0, 0] = correct
    cm[0, 1] = total - correct
    result = {
        "params": params,
        "metrics": {
            g: {
                "accuracy": accuracy,
                "mean_iou": accuracy,
                "confusion_matrix": cm.tolist(),
            }
            for g in ("vertex", "image_network", "image_fused")
        },
    }
    return result


def base_params(**over):
    p = dict(
        images_equal_weight=1.0, frames_step=1, mode="triangles",
        aggregator="mul", mesh="scannet", num=100, offset=0, simplify="1.0",
    )
    p.update(over)
    return p


def test_graphs_end_to_end(tmp_path):
    runs = [
        # texel-resolution sweep (texels need texel_resolution param)
        _run_yaml(base_params(mode="texels", texel_resolution=0.1), 0.80),
        _run_yaml(base_params(mode="texels", texel_resolution=0.2), 0.82),
        _run_yaml(base_params(), 0.78),  # triangles (texel_resolution 0)
        # images_equal_weight point
        _run_yaml(base_params(images_equal_weight=0.0), 0.70),
        # split run to merge: same parametrization, two offsets
        _run_yaml(base_params(aggregator="sum", num=50, offset=0), 0.60),
        _run_yaml(base_params(aggregator="sum", num=50, offset=50), 0.70),
        # incomplete run to drop
        _run_yaml(base_params(aggregator="summax", num=10), 0.99),
        # frames_step sweep entry
        _run_yaml(base_params(frames_step=10), 0.66),
    ]
    for i, r in enumerate(runs, 1):
        with open(tmp_path / f"run-{i}.yaml", "w") as f:
            yaml.dump(r, f)

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "create_scannet_eval_graphs.py"),
            "--path", str(tmp_path),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "Merging" in proc.stdout  # the split sum runs merged

    produced = set(os.listdir(tmp_path))
    assert "aggregators.csv" in produced
    assert "texelres_to_accuracy.png" in produced
    assert "imagesequalweight_to_accuracy.png" in produced
    assert "framesstep_to_accuracy.png" in produced

    csv = (tmp_path / "aggregators.csv").read_text().splitlines()
    assert csv[0] == "aggregator,accuracy_w_i,accuracy_w_p"
    rows = {ln.split(",")[0]: ln for ln in csv[1:]}
    # merged sum run: accuracy recomputed from summed CMs = 0.65
    assert "sum" in rows
    assert abs(float(rows["sum"].split(",")[1]) - 0.65) < 1e-6
    # the incomplete summax run (num=10 < 100) must have been dropped
    assert "summax" not in rows


def test_graphs_same_offset_guard(tmp_path):
    r = _run_yaml(base_params(num=50, offset=0), 0.5)
    for i in (1, 2):
        with open(tmp_path / f"run-{i}.yaml", "w") as f:
            yaml.dump(r, f)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "eval-scannet", "create_scannet_eval_graphs.py"),
            "--path", str(tmp_path),
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0  # duplicate-offset exit(-1)
    assert "Same offset" in proc.stdout


@pytest.mark.slow
def test_make_paper_graphs_end_to_end(tmp_path):
    """The capstone composition: synthetic scenes -> eval_scannet.py grid
    -> result YAMLs -> create_scannet_eval_graphs.py, via
    scripts/make_paper_graphs.py (no dataset mount). Asserts the four
    plots + aggregator CSV exist and that fusion beat the noisy network
    predictions (the paper's core claim)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SM_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "make_paper_graphs.py"),
            "--out", str(tmp_path),
            "--grid", "smoke",
            "--scenes", "1", "--views", "4",
            "--subdivisions", "4", "--width", "128", "--height", "96",
        ],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    results = tmp_path / "results"
    for artifact in (
        "texelres_to_accuracy.png",
        "imagesequalweight_to_accuracy.png",
        "simplify_to_accuracy.png",
        "framesstep_to_accuracy.png",
        "aggregators.csv",
    ):
        assert (results / artifact).is_file(), artifact
    yamls = sorted(results.glob("run-*.yaml"))
    assert len(yamls) == 3  # the smoke grid
    for y in yamls:
        d = yaml.safe_load(y.read_text())
        net = d["metrics"]["image_network"]["accuracy"]
        fused = d["metrics"]["image_fused"]["accuracy"]
        assert net < 0.9  # the seeded noise really degraded the network
        assert fused > net + 0.05  # and fusion really fixed it
    # the aggregator table has a row per aggregator in the grid
    csv = (results / "aggregators.csv").read_text().splitlines()
    assert csv[0] == "aggregator,accuracy_w_i,accuracy_w_p"
    assert {r.split(",")[0] for r in csv[1:]} == {"sum", "mul"}
