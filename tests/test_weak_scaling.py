"""Weak-scaling structure of the sharded fusion across device counts.

test_collective_structure.py pins the collective inventory at 8 devices;
this file asserts how that inventory SCALES: tracing make_sharded_fuse on
8-, 16- and 32-device meshes (subprocess children with
--xla_force_host_platform_device_count=N; tracing only, no compile) must
show

- a collective COUNT that stays flat (the per-view pixel psum + per-view
  reduce-scatter + final overflow psum; nothing grows with the mesh), and
- a reduce-scatter whose per-chip OUTPUT rows halve per device doubling
  (the scan carry holds P / n_views_shards rows — the memory property that
  lets huge meshes ride more chips),

matching the docs/PERFORMANCE.md weak-scaling cost model.
"""

import json
import os
import re
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from semantic_meshes import distributed, testing
from semantic_meshes.data import stack_cameras

n = int(sys.argv[1])
P = int(sys.argv[2])
devices = np.array(jax.devices()[:n])
views = n // 2
mesh = Mesh(devices.reshape(views, 2), ("views", "pixels"))

H, W, C = 32, 64, 5
N = views * 2  # two views per chip row
vertices, faces = testing.make_cube(subdivisions=3)
cams = testing.make_ring_cameras(num_views=N, width=W, height=H)
rng = np.random.default_rng(0)
probs = jnp.asarray(rng.random((N, H, W, C), np.float32))
rot, trans, fl, pp = stack_cameras(cams)

fuse = distributed.make_sharded_fuse(
    mesh, num_primitives=P, aggregator="sum", height=H, width=W,
    shard_primitives=True,
)
jaxpr = jax.make_jaxpr(fuse)(
    jnp.asarray(vertices), jnp.asarray(faces), rot, trans, fl, pp,
    probs, jnp.float32(0.5),
)

COLLECTIVES = ("ppermute", "all_gather", "all_to_all", "reduce_scatter",
               "pgather", "pmin", "pmax")

def sub_jaxprs(v):
    if hasattr(v, "eqns"):
        yield v
    elif hasattr(v, "jaxpr"):
        yield v.jaxpr
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from sub_jaxprs(x)

found = []
def walk(jx, path):
    for eqn in jx.eqns:
        name = eqn.primitive.name
        if "psum" in name or name in COLLECTIVES:
            axes = eqn.params.get("axes", eqn.params.get("axis_name", ()))
            if not isinstance(axes, tuple):
                axes = (axes,)
            found.append({
                "path": path,
                "name": name,
                "axes": [str(a) for a in axes],
                "in_shapes": [list(v.aval.shape) for v in eqn.invars],
                "out_shapes": [list(v.aval.shape) for v in eqn.outvars],
            })
        for v in eqn.params.values():
            for sj in sub_jaxprs(v):
                walk(sj, path + "/" + name)

walk(jaxpr.jaxpr, "root")
print("RESULT " + json.dumps({"n": n, "views": views, "colls": found}))
"""


def _trace_at(n, P=1344):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("SM_TEST_TPU", None)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, str(n), str(P)],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"trace child at n={n} failed\n{proc.stdout}\n{proc.stderr}"
    )
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    )
    return json.loads(line[len("RESULT "):])


@pytest.mark.parametrize("P", [1344])
def test_collective_count_flat_and_reduce_scatter_rows_halve(P):
    results = [_trace_at(n, P) for n in (8, 16, 32)]

    # collective inventory (multiset of (name, axes)) is IDENTICAL at
    # every device count — nothing scales with the mesh
    inventories = [
        sorted((c["name"], tuple(c["axes"])) for c in r["colls"])
        for r in results
    ]
    assert inventories[0] == inventories[1] == inventories[2], inventories
    names = {c["name"] for r in results for c in r["colls"]}
    assert "reduce_scatter" in names, names

    # the reduce-scatter consumes the full (P, C) per-view partial and
    # emits the chip's P/views block: rows halve per device doubling
    out_rows = []
    for r in results:
        rs = [c for c in r["colls"] if c["name"] == "reduce_scatter"]
        assert len(rs) == 1, rs
        assert rs[0]["in_shapes"] == [[P, 5]], rs
        assert rs[0]["out_shapes"] == [[P // r["views"], 5]], rs
        out_rows.append(rs[0]["out_shapes"][0][0])
    assert out_rows[0] == 2 * out_rows[1] == 4 * out_rows[2], out_rows

    # the per-view pixel-count psum's payload is resolution-bound,
    # independent of the mesh
    for r in results:
        counts = [
            c for c in r["colls"]
            if "psum" in c["name"] and c["axes"] == ["pixels"]
        ]
        assert len(counts) == 1, r["colls"]
        assert counts[0]["in_shapes"] == [[P, 6]], counts
