"""Checkpoint / resume for fusion state.

The reference's resume story is ad-hoc (npz render caches + skip-finished
YAML parametrizations, ref: eval-scannet/eval_scannet.py:70-78,170-184;
`aggregator.reset()` exists but partial fusion cannot resume, SURVEY.md §5).
Here the aggregator state is a plain pytree, so true fusion resume is one
save/load pair. Format: .npz with the accumulator and the aggregator's
constructor params + a cursor for "how many views are already fused".
"""

from __future__ import annotations

import json

import numpy as np

from .fusion import MeshAggregator

_FORMAT_VERSION = 1


def save_aggregator(path, aggregator: MeshAggregator, views_done: int = 0,
                    extra: dict | None = None):
    """Persist a MeshAggregator mid-fusion. `views_done` is the caller's
    cursor (how many views were already add()ed); `extra` is any small
    JSON-serializable metadata."""
    meta = dict(
        format_version=_FORMAT_VERSION,
        primitives=aggregator.primitives,
        classes=aggregator.classes,
        aggregator=aggregator.aggregator,
        images_equal_weight=aggregator.images_equal_weight,
        views_done=int(views_done),
        extra=extra or {},
    )
    # write through a file handle: np.savez_compressed(path, ...) silently
    # appends ".npz" to extensionless paths, breaking load(path)
    with open(path, "wb") as f:
        np.savez_compressed(
            f,
            state=np.asarray(aggregator.state),
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )


def load_aggregator(path):
    """Restore (MeshAggregator, views_done, extra) from save_aggregator."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta"].tobytes()).decode())
    if meta["format_version"] != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported checkpoint format {meta['format_version']}"
        )
    agg = MeshAggregator(
        meta["primitives"],
        meta["classes"],
        aggregator=meta["aggregator"],
        images_equal_weight=meta["images_equal_weight"],
    )
    agg.state = data["state"]
    return agg, meta["views_done"], meta["extra"]
