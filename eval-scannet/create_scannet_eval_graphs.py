#!/usr/bin/env python3
"""Aggregate ScanNet eval YAMLs into the paper's plots + aggregator CSV.

Port of the reference report generator
(ref: eval-scannet/create_scannet_eval_graphs.py:1-256): loads result YAMLs,
normalizes legacy parametrizations, merges runs of equal parametrization by
summing confusion matrices (guarding against duplicate offsets), recomputes
accuracy from merged CMs, and emits:
  texelres_to_accuracy.png, imagesequalweight_to_accuracy.png,
  simplify_to_accuracy.png, framesstep_to_accuracy.png, aggregators.csv
"""

import argparse
import os
import sys
from collections import defaultdict
from copy import deepcopy

import numpy as np
import yaml

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import matplotlib.ticker  # noqa: E402

parser = argparse.ArgumentParser(
    description="Create graphs for finished scannet evaluations"
)
parser.add_argument("--path", type=str, required=True,
                    help="Path to scannet evaluation .yaml files")
parser.add_argument("--min_scenes", type=int, default=100,
                    help="Drop scannet runs evaluated on fewer scenes "
                         "(the reference hardcodes 100, ref lines 90-96); "
                         "lower it for small/synthetic datasets, e.g. "
                         "scripts/make_paper_graphs.py passes 1")
args = parser.parse_args()

plotargs = {"marker": "o", "markersize": 6}
fontsize = 15


def cm_to_accuracy(cm):
    cm = np.asarray(cm, np.float64)
    total = cm.sum()
    return float(np.trace(cm[:, : cm.shape[0]]) / total) if total else 0.0


print("Reading yaml files...")
params = []
for fname in sorted(os.listdir(args.path)):
    if not fname.endswith(".yaml"):
        continue
    with open(os.path.join(args.path, fname)) as f:
        p = yaml.safe_load(f)
    if p is None:
        continue
    assert "path" not in p["params"]
    p["path"] = os.path.join(args.path, fname)
    # normalize legacy parametrizations (ref lines 27-47)
    p["params"].setdefault("aggregator", "sum")
    p["params"]["simplify"] = float(p["params"].get("simplify", 1.0))
    p["params"].setdefault("mesh", "scannet")
    p["params"].setdefault("num", 100)
    p["params"].setdefault("offset", 0)
    if "texel_resolution" not in p["params"]:
        assert p["params"]["mode"] == "triangles"
        p["params"]["texel_resolution"] = 0.0
    for group in ["image_fused", "image_network", "vertex"]:
        for key in list(p["metrics"][group].keys()):
            if key.lower().startswith("confusion_matrix") or \
                    key.startswith("ConfusionMatrix"):
                p["metrics"][group]["ConfusionMatrix"] = np.asarray(
                    p["metrics"][group][key]
                )
                if key != "ConfusionMatrix":
                    del p["metrics"][group][key]
    params.append(p)


def same_parametrization(p1, p2):
    a = deepcopy(p1["params"])
    b = deepcopy(p2["params"])
    for k in ("num", "offset"):
        a.pop(k, None)
        b.pop(k, None)
    return a == b


def merge_equal_parametrizations(runs):
    """Fold result files that share a parametrization (they cover
    different offset/num scene windows of the same experiment) into one
    run each: confusion matrices sum, scene counts add, and any cached
    scalar metrics are dropped so they get recomputed from the merged
    CMs. Two files covering the SAME scene window would double-count —
    that aborts (every merged window's offset is tracked, so a duplicate
    is caught even when it collides with an already-merged file rather
    than the group's first one)."""
    merged = []
    for run in runs:
        target = next(
            (m for m in merged if same_parametrization(m, run)), None
        )
        if target is None:
            run["_offsets"] = {run["params"]["offset"]}
            merged.append(run)
            continue
        if run["params"]["offset"] in target["_offsets"]:
            print("Same offset in:")
            print(target["path"], target["params"])
            print(run["path"], run["params"])
            sys.exit(-1)
        target["_offsets"].add(run["params"]["offset"])
        print(f"Merging {run['path']} into {target['path']}")
        for group in ("image_fused", "image_network"):
            tm = target["metrics"][group]
            tm["ConfusionMatrix"] = (
                tm["ConfusionMatrix"]
                + run["metrics"][group]["ConfusionMatrix"]
            )
            for stale in ("accuracy", "Accuracy", "mean_iou", "MeanIoU"):
                tm.pop(stale, None)
        target["params"]["num"] += run["params"]["num"]
    for m in merged:
        del m["_offsets"]
    return merged


# merge runs of equal parametrization (ref lines 57-88)
params = merge_equal_parametrizations(params)

# drop incomplete scannet runs (ref lines 90-96)
params = [
    p for p in params
    if not (p["params"]["mesh"] == "scannet"
            and p["params"]["num"] < args.min_scenes)
]

for p in params:
    for group in ("image_fused", "image_network"):
        m = p["metrics"][group]
        if "Accuracy" not in m and "accuracy" not in m:
            m["Accuracy"] = cm_to_accuracy(m["ConfusionMatrix"])


def accuracy(p, group="image_fused"):
    m = p["metrics"][group]
    return m.get("Accuracy", m.get("accuracy"))


used = set()


def report(name, ps):
    print(f"Plot: {name}")
    for p in ps:
        print(
            f"    {os.path.basename(p['path'])} {p['params']} "
            f"{accuracy(p) * 100.0:.3f}"
        )
        used.add(p["path"])


def finish(path):
    plt.gcf().subplots_adjust(left=0.2, right=0.9, bottom=0.15, top=0.95)
    plt.savefig(path, dpi=300)
    plt.close(1)


pct = matplotlib.ticker.FuncFormatter(lambda x, _: f"{x * 100.0:.1f}%")

print("Creating plots...")

# --- texel resolution -> accuracy
ps = sorted(
    (
        p for p in params
        if p["params"]["frames_step"] == 1
        and p["params"]["simplify"] == 1.0
        and p["params"]["mesh"] == "scannet"
        and p["params"]["images_equal_weight"] == 1.0
        and p["params"]["aggregator"] == "mul"
    ),
    key=lambda p: p["params"]["texel_resolution"],
)
report("texelres_to_accuracy", ps)
if ps:
    plt.figure(1)
    plt.rcParams.update({"font.size": fontsize})
    plt.plot(
        [p["params"]["texel_resolution"] for p in ps],
        [accuracy(p) for p in ps],
        **plotargs,
    )
    plt.xlabel(r"Texel resolution $\gamma$")
    plt.ylabel("Pixel accuracy")
    plt.gca().get_yaxis().set_major_formatter(pct)
    plt.gca().set_xlim(left=0)
    finish(os.path.join(args.path, "texelres_to_accuracy.png"))

# --- images_equal_weight -> accuracy
ps = sorted(
    (
        p for p in params
        if p["params"]["frames_step"] == 1
        and p["params"]["mode"] == "triangles"
        and p["params"]["images_equal_weight"] <= 1.0
        and p["params"]["aggregator"] == "mul"
        and p["params"]["mesh"] == "scannet"
        and p["params"]["simplify"] == 1.0
    ),
    key=lambda p: p["params"]["images_equal_weight"],
)
report("imagesequalweight_to_accuracy", ps)
if ps:
    plt.figure(1)
    plt.rcParams.update({"font.size": fontsize})
    plt.plot(
        [p["params"]["images_equal_weight"] for p in ps],
        [accuracy(p) for p in ps],
        **plotargs,
    )
    plt.xticks([0.0, 1.0], labels=[r"$w^{(P)}$", r"$w^{(I)}$"])
    plt.ylabel("Pixel accuracy")
    plt.gca().get_yaxis().set_major_formatter(pct)
    finish(os.path.join(args.path, "imagesequalweight_to_accuracy.png"))

# --- aggregator table (ref lines 170-193 write a CSV)
ps = [
    p for p in params
    if p["params"]["frames_step"] == 1
    and p["params"]["mode"] == "triangles"
    and p["params"]["images_equal_weight"] in (0.0, 1.0)
    and p["params"]["simplify"] == 1.0
    and p["params"]["mesh"] == "scannet"
]
report("aggregators", ps)
aggregators = sorted({p["params"]["aggregator"] for p in ps})
by_w = {
    w: {p["params"]["aggregator"]: accuracy(p)
        for p in ps if p["params"]["images_equal_weight"] == w}
    for w in (1.0, 0.0)
}
with open(os.path.join(args.path, "aggregators.csv"), "w") as f:
    f.write("aggregator,accuracy_w_i,accuracy_w_p\n")
    for agg in aggregators:
        f.write(
            f"{agg},{by_w[1.0].get(agg, float('nan'))},"
            f"{by_w[0.0].get(agg, float('nan'))}\n"
        )

# --- simplification -> accuracy
texel_resolutions = [0.0, 0.2]
by_tex = defaultdict(dict)
ps = []
for p in params:
    if (
        p["params"]["frames_step"] == 1
        and p["params"]["images_equal_weight"] == 1.0
        and p["params"]["aggregator"] == "mul"
        and p["params"]["mesh"] == "scannet"
        and p["params"]["texel_resolution"] in texel_resolutions
    ):
        ps.append(p)
        by_tex[p["params"]["texel_resolution"]][p["params"]["simplify"]] = p
report("simplify_to_accuracy", ps)
if ps:
    simplify_keys = sorted({p["params"]["simplify"] for p in ps})
    xs = np.asarray(simplify_keys)
    plt.figure(1)
    plt.rcParams.update({"font.size": fontsize})
    for tex, d1 in sorted(by_tex.items()):
        ys = [
            accuracy(d1[s]) if s in d1 else float("nan")
            for s in simplify_keys
        ]
        plt.plot(np.log(xs), ys, label=rf"$\gamma={tex}$", **plotargs)
    baseline = accuracy(ps[0], "image_network")
    plt.plot(
        np.log(np.asarray([xs[0], xs[-1]])), [baseline, baseline],
        label="Baseline", linestyle="--", color=np.array([1.0, 0.1, 0.1]),
    )
    plt.xlabel("Proportion of triangles")
    plt.ylabel("Pixel accuracy")
    plt.gca().get_yaxis().set_major_formatter(pct)
    ticks = np.power(10.0, np.array([0, 1, 2]))
    plt.xticks(np.log(1.0 / ticks), [f"{1.0 / t * 100.0:.1f}%" for t in ticks])
    plt.gca().set_xlim(right=0)
    plt.legend()
    finish(os.path.join(args.path, "simplify_to_accuracy.png"))

# --- frames step -> accuracy
ps = sorted(
    (
        p for p in params
        if p["params"]["mode"] == "triangles"
        and p["params"]["images_equal_weight"] == 1.0
        and p["params"]["aggregator"] == "mul"
        and p["params"]["mesh"] == "scannet"
        and p["params"]["simplify"] == 1.0
    ),
    key=lambda p: p["params"]["frames_step"],
)
report("framesstep_to_accuracy", ps)
if ps:
    xs = [1.0 / p["params"]["frames_step"] for p in ps]
    plt.figure(1)
    plt.rcParams.update({"font.size": fontsize})
    plt.plot(np.log(xs), [accuracy(p) for p in ps], **plotargs)
    plt.xlabel("Proportion of frames")
    plt.ylabel("Pixel accuracy")
    plt.gca().get_yaxis().set_major_formatter(pct)
    plt.gca().get_xaxis().set_major_formatter(
        matplotlib.ticker.FuncFormatter(
            lambda x, _: f"{np.exp(x) * 100.0:.1f}%"
        )
    )
    ticks = np.power(10.0, np.array([0, 1, 2]))
    plt.xticks(np.log(1.0 / ticks), [f"{1.0 / t * 100.0:.1f}%" for t in ticks])
    plt.gca().set_xlim(right=0)
    finish(os.path.join(args.path, "framesstep_to_accuracy.png"))

unused = [p for p in params if p["path"] not in used]
if unused:
    print("Unused params:")
    for p in unused:
        print(f"    {os.path.basename(p['path'])} {p['params']}")
