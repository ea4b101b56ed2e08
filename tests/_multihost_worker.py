"""Worker process for the 2-process multihost smoke test.

Each process joins the jax distributed runtime (localhost coordinator),
contributes 4 virtual CPU devices to a global 8-device (views, pixels)
mesh, runs make_sharded_fuse on the deterministic cube scene, and writes
its replica of the merged accumulator to --out. The parent test asserts
both replicas equal the single-process reference.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from semantic_meshes import distributed, testing
    from semantic_meshes.data import stack_cameras

    distributed.initialize_multihost(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == 8, jax.device_count()

    mesh = distributed.make_device_mesh(views_axis=4, pixels_axis=2)

    vertices, faces = testing.make_cube(subdivisions=4)
    H, W, C = 64, 128, 5
    cams = testing.make_ring_cameras(num_views=4, width=W, height=H)
    rng = np.random.default_rng(0)  # same seed on every process
    probs = np.stack([testing.random_probs(rng, H, W, C) for _ in cams])
    rot, trans, fl, pp = stack_cameras(cams)

    fuse = distributed.make_sharded_fuse(
        mesh, num_primitives=len(faces), aggregator="sum",
        height=H, width=W,
    )
    with mesh:
        acc, _overflow = jax.jit(fuse)(
            vertices, faces, rot, trans, fl, pp, probs, np.float32(0.5)
        )
    # out_specs P() -> fully replicated; every process holds a replica
    local = np.asarray(acc.addressable_data(0))

    # triangle-sharded rasterization across PROCESSES: the (z, id) pmin
    # winner merge rides DCN here, the hardest transport for it
    mesh3 = distributed.make_device_mesh(
        views_axis=2, pixels_axis=2, faces_axis=2
    )
    fuse3 = distributed.make_sharded_fuse(
        mesh3, num_primitives=len(faces), aggregator="sum",
        height=H, width=W,
    )
    with mesh3:
        acc3, _ov3 = jax.jit(fuse3)(
            vertices, faces, rot, trans, fl, pp, probs, np.float32(0.5)
        )
    np.testing.assert_allclose(
        np.asarray(acc3.addressable_data(0)), local, rtol=2e-5, atol=1e-5
    )

    np.save(args.out, local)
    print(f"process {args.process_id} ok", flush=True)


if __name__ == "__main__":
    main()
