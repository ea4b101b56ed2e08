"""Guard the round driver's entry points against bitrot.

The driver compile-checks __graft_entry__.entry() and runs bench.py at the
end of every round; neither was covered by the suite before this file.
"""

import json
import os
import subprocess
import sys

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_graft_entry_traces_and_lowers():
    sys.path.insert(0, _REPO)
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    fn, example_args = ge.entry()
    lowered = jax.jit(fn).lower(*example_args)
    text = lowered.as_text()
    assert "stablehlo" in text or "module" in text
    # the forward step returns the (P, C) accumulator
    out_shape = jax.eval_shape(fn, *example_args)
    assert out_shape.shape == (300, 19)


def test_bench_small_preset_prints_one_json_line():
    env = dict(os.environ)
    env["SM_PLATFORM"] = "cpu"  # never touch the (possibly absent) TPU
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py"),
         "--preset", "small", "--repeats", "1", "--no-extra"],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "rasterize_fuse_throughput"
    assert rec["unit"] == "MPix/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / 10.0, 3)
    det = rec["detail"]
    assert det["overflow"] == 0
    assert len(det["region_seconds_per_batch"]) == 3
    assert det["seconds_per_batch"] == min(det["region_seconds_per_batch"])
