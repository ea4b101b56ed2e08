"""Rasterizer backends.

- `xla`: pure-jnp tile-binned rasterizer (runs everywhere; CPU test oracle)
- `pallas_kernel`: Pallas TPU kernel with VMEM z-buffers and dynamic
  per-tile candidate counts (~5x the XLA path on v5e, bit-identical output)
- `dense`: sort-based binning + micro-fragment path + HBM-streaming Pallas
  kernel for large meshes (no per-tile candidate cap)

`rasterize(...)` dispatches: on TPU, `pallas` for small meshes and `dense`
above DENSE_THRESHOLD triangles; `xla` elsewhere. Override with
backend="xla"|"pallas"|"dense" or the SM_RASTERIZER env var.
"""

import os

import jax
import jax.numpy as jnp

from . import xla  # noqa: F401

DENSE_THRESHOLD = int(os.environ.get("SM_DENSE_THRESHOLD", 16384))


def default_backend(num_tris=None):
    env = os.environ.get("SM_RASTERIZER")
    if env in ("xla", "pallas", "dense"):
        return env
    if jax.default_backend() != "tpu":
        return "xla"
    if num_tris is not None and num_tris >= DENSE_THRESHOLD:
        return "dense"
    return "pallas"


def get(backend=None, num_tris=None):
    backend = backend or default_backend(num_tris)
    if backend == "pallas":
        from . import pallas_kernel

        return pallas_kernel
    if backend == "dense":
        from . import dense

        return dense
    return xla


def rasterize(vertices, faces, *args, backend=None, **kwargs):
    mod = get(backend, num_tris=faces.shape[0])
    dense_e_cap = kwargs.pop("dense_e_cap", None)
    tri_ids = kwargs.pop("tri_ids", None)
    if tri_ids is not None and mod.__name__.endswith("dense"):
        # zero-cost on the dense path: ids ride the fragment-sort payload
        # and the packed candidate table (dense.rasterize tri_ids)
        kwargs["tri_ids"] = tri_ids
        tri_ids = None
    if mod is not xla:
        # xla-only tuning knob; pallas paths have their own caps
        if mod.__name__.endswith("dense"):
            kwargs.pop("max_tris_per_tile", None)
            if dense_e_cap is not None:
                # int: pair budget only; (pairs, micro) tuple also
                # right-sizes the micro fragment path; a third element is
                # the routing threshold the budgets were probed at
                # (SM_MICRO_MAX=auto — see dense.pick_micro_max); a
                # fourth is the uni-slot prefix length (dense.rasterize
                # micro_split — faces must be permuted uni-first and a
                # None micro budget is implied, see uni_eligible)
                if isinstance(dense_e_cap, tuple):
                    kwargs["e_cap_rows"] = int(dense_e_cap[0])
                    if len(dense_e_cap) > 3 and dense_e_cap[3] is not None:
                        kwargs["micro_split"] = int(dense_e_cap[3])
                    else:
                        kwargs["micro_cap_rows"] = int(dense_e_cap[1])
                    if len(dense_e_cap) > 2 and dense_e_cap[2] is not None:
                        kwargs["micro_max"] = int(dense_e_cap[2])
                else:
                    kwargs["e_cap_rows"] = int(dense_e_cap)
    out = mod.rasterize(vertices, faces, *args, **kwargs)
    if tri_ids is not None:
        # non-dense backends: remap rendered ids per pixel (coherent
        # gather — rendered index images are spatially coherent)
        idx, z, overflow = out
        idx = jnp.where(
            idx >= 0,
            jnp.asarray(tri_ids, jnp.int32)[jnp.maximum(idx, 0)],
            idx,
        )
        out = (idx, z, overflow)
    return out


def uses_dense(backend=None, num_tris=None):
    """True when dispatch would pick the dense backend (the renderers use
    this to decide whether the e_cap probe is worth a one-time sync)."""
    return (backend or default_backend(num_tris)) == "dense"


def dense_candidate_count(*args, **kwargs):
    from . import dense

    return dense.candidate_count(*args, **kwargs)


def dense_candidate_stats(*args, **kwargs):
    from . import dense

    return dense.candidate_stats(*args, **kwargs)


def dense_routing_stats(*args, **kwargs):
    from . import dense

    return dense.routing_stats(*args, **kwargs)


# shared helpers / contract constants re-exported
Z_NEAR = xla.Z_NEAR
INVALID_U32 = xla.INVALID_U32
barycentrics_at_pixels = xla.barycentrics_at_pixels
project_vertices = xla.project_vertices
