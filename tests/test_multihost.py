"""2-process multihost smoke test: jax.distributed over a localhost
coordinator, 4 virtual CPU devices per process (8 global), running
make_sharded_fuse across both processes. Covers
distributed.initialize_multihost, which no in-process test can reach
(the DCN path of SURVEY.md §2c)."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fuse_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

    procs = [
        subprocess.Popen(
            [
                sys.executable, worker,
                "--process_id", str(i), "--num_processes", "2",
                "--port", str(port),
                "--out", str(tmp_path / f"acc{i}.npy"),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"

    acc0 = np.load(tmp_path / "acc0.npy")
    acc1 = np.load(tmp_path / "acc1.npy")
    np.testing.assert_array_equal(acc0, acc1)  # replicated output

    # single-process reference on the same deterministic scene
    from semantic_meshes import distributed, testing
    from semantic_meshes.data import stack_cameras

    vertices, faces = testing.make_cube(subdivisions=4)
    H, W, C = 64, 128, 5
    cams = testing.make_ring_cameras(num_views=4, width=W, height=H)
    rng = np.random.default_rng(0)
    probs = np.stack([testing.random_probs(rng, H, W, C) for _ in cams])
    rot, trans, fl, pp = stack_cameras(cams)
    ref = np.asarray(
        distributed.fuse_views(
            vertices, faces, rot, trans, fl, pp, probs, np.float32(0.5),
            num_primitives=len(faces), aggregator="sum", height=H, width=W,
        )[0]
    )
    assert np.abs(ref).sum() > 0
    np.testing.assert_allclose(acc0, ref, rtol=2e-5, atol=1e-5)
