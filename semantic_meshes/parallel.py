"""Parallelism facade — alias of :mod:`semantic_meshes.distributed`.

The multi-chip/multi-host machinery lives in distributed.py (shard_map
pipelines, mesh/multihost helpers); this module re-exports it under the
conventional `parallel` name.
"""

from .distributed import (  # noqa: F401
    fuse_views,
    fuse_views_texels,
    initialize_multihost,
    make_device_mesh,
    make_sharded_fuse,
    render_and_accumulate,
    view_accumulate,
)
