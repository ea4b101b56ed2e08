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
import os

import numpy as np

from .fusion import MeshAggregator

_FORMAT_VERSION = 1


class CheckpointError(ValueError):
    """Corrupt/truncated/incompatible fusion checkpoint. Every load
    failure raises this (np.load's raw failure zoo — BadZipFile, EOFError,
    KeyError, JSONDecodeError — leaked through before)."""


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
    # Crash-safe: write to a sibling temp file, flush+fsync, and
    # os.replace — a SIGKILL mid-write must never leave a truncated file
    # at `path` (a resume would die on it; caught by the sigkill test in
    # test_eval_scannet.py), and the fsync extends the guarantee to power
    # loss / OS crash, where an unsynced rename can publish an empty or
    # truncated file (ADVICE r4: a permanently wedged checkpoint dir).
    # Also write through a file handle: np.savez_compressed(path, ...)
    # silently appends ".npz" to extensionless paths, breaking load(path).
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            state=np.asarray(aggregator.state),
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_aggregator(path):
    """Restore (MeshAggregator, views_done, extra) from save_aggregator.

    Raises CheckpointError on anything that is not a compatible
    checkpoint (corrupt zip, missing keys, malformed metadata, or an
    accumulator whose shape contradicts the recorded constructor params —
    a crash mid-write cannot resume into silently-wrong fusion state)."""
    try:
        data = np.load(path)
        meta = json.loads(bytes(data["meta"].tobytes()).decode())
        fmt = meta["format_version"]
        state = data["state"]
        if fmt == _FORMAT_VERSION:
            agg = MeshAggregator(
                meta["primitives"],
                meta["classes"],
                aggregator=meta["aggregator"],
                images_equal_weight=meta["images_equal_weight"],
            )
            expected = np.shape(agg.state)
            got = np.shape(state)
            views_done, extra = meta["views_done"], meta["extra"]
    except Exception as e:  # noqa: BLE001 — np.load's failure zoo
        raise CheckpointError(
            f"{path}: not a valid fusion checkpoint "
            f"({type(e).__name__}: {e})"
        ) from None
    if fmt != _FORMAT_VERSION:
        raise CheckpointError(
            f"{path}: unsupported checkpoint format {fmt}"
        )
    if got != expected:
        raise CheckpointError(
            f"{path}: accumulator shape {got} contradicts the recorded "
            f"params (expected {expected})"
        )
    agg.state = state
    return agg, views_done, extra
