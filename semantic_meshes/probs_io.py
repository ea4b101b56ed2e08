"""Wire formats for precomputed class-probability maps.

The reference treats the 2D segmentation model as external (ref:
README.md:24-29 step 2); its eval consumes the model's dense float maps
directly from GPU memory. When maps instead arrive from disk (the
--probs legs of scripts/colorize_cityscapes_mesh.py and
eval-scannet/eval_scannet.py), the host->device upload dominates the
pipeline on slow links: a 2048x1024x19 float32 map is 160 MB/frame.

This module owns the compact wire formats and their device-side
decoders. Fusion math stays float32 on device in every case.

  dense  <base>.npy  (H, W, C) float32/float16/uint8
         uint8 stores rint(p*255): <= 1/510 abs error per class.
  top-k  <base>.npz  {values (H, W, K) f16/u8 descending, indices
         (H, W, K) uint8, classes ()} — written by
         scripts/precompute_probs.py --topk K. Dropped mass per pixel is
         bounded by K * p_(K+1) <= (1 - sum(values)).

         Densify spreads the residual mass (1 - sum(values)) uniformly
         over the dropped classes instead of writing exact zeros: with
         aggregator="mul" a zero is log-space -inf (fusion.py), so a
         class outside the top-K in even ONE view would be permanently
         vetoed — the uniform floor (1-s)/(C-K) upper-bounds every
         dropped probability (values are the LARGEST K, so each dropped
         p <= s/K and also <= the residual mean only in aggregate; the
         floor keeps mul fusion finite with error bounded by the same
         dropped-mass bound). The spread applies ONLY where the
         retained sum exceeds the don't-care threshold (sum > 0.5,
         ref: fusion/Mesh.h:98): don't-care pixels — including the
         all-zero padding views of the chunked demo — keep their
         shrunken sum and stay skipped.

`load(base)` reads either file and starts the async upload;
`densify(loaded)` turns it into the dense float32 (H, W, C) map on
device (one fused XLA pass: broadcast-compare one-hot times values,
summed over K — never materialized on host).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class TopKProbs(NamedTuple):
    """Device-resident top-K probability map (values descending)."""

    values: jax.Array   # (H, W, K) float16 or uint8
    indices: jax.Array  # (H, W, K) uint8
    classes: int


WIRE_DTYPES = {
    "f32": np.float32,
    "f16": np.float16,
    "bf16": None,  # resolved via jnp at cast time (numpy has no bf16)
    "u8": np.uint8,
}


def quantize_u8(probs: np.ndarray) -> np.ndarray:
    """rint(p*255) — the storage/wire quantization for uint8 maps."""
    return np.rint(probs.astype(np.float32) * 255.0).astype(np.uint8)


def _cast_wire(probs: np.ndarray, wire: str) -> np.ndarray:
    if wire == "u8":
        if probs.dtype == np.uint8:
            return probs  # already quantized on disk
        return quantize_u8(probs)
    if probs.dtype == np.uint8:
        # stored quantized, wider wire requested: undo the quantization
        # (plain astype would drop the /255 scale)
        probs = probs.astype(np.float32) * np.float32(1.0 / 255.0)
    if wire == "bf16":
        import ml_dtypes  # ships with jax

        dt = np.dtype(ml_dtypes.bfloat16)
        return probs if probs.dtype == dt else probs.astype(dt)
    dt = WIRE_DTYPES[wire]
    return probs if probs.dtype == dt else probs.astype(dt)


def load(base: str, wire: str = "f16") -> Union[jax.Array, TopKProbs]:
    """Load `<base>.npy` (dense) or `<base>.npz` (top-k) and start the
    async host->device upload. `wire` re-casts DENSE maps for the wire
    (top-k maps ship in their stored dtype — already compact). Call from
    a prefetch worker so the transfer overlaps compute."""
    npz = base + ".npz"
    if os.path.exists(npz):
        with np.load(npz) as z:
            vals, idx = z["values"], z["indices"]
            classes = int(z["classes"])
        return TopKProbs(
            jax.device_put(np.ascontiguousarray(vals)),
            jax.device_put(np.ascontiguousarray(idx)),
            classes,
        )
    probs = np.load(base + ".npy")
    return jax.device_put(np.ascontiguousarray(_cast_wire(probs, wire)))


@partial(jax.jit, static_argnums=1)
def _densify_topk(t: tuple, classes: int) -> jax.Array:
    values, indices = t
    vals = values.astype(jnp.float32)
    if values.dtype == jnp.uint8:
        vals = vals * np.float32(1.0 / 255.0)
    # one-hot compare fused into the K-sum by XLA: one pass over the
    # (H, W, C) output, no (H, W, K, C) intermediate in HBM
    onehot = (
        indices[..., None] == jnp.arange(classes, dtype=jnp.int32)
    )
    dense = jnp.sum(vals[..., None] * onehot, axis=-2)
    k = values.shape[-1]
    if k >= classes:
        return dense
    # residual spread (see module docstring): dropped classes get the
    # uniform floor (1-s)/(C-K) — never exact zero, which aggregator=
    # "mul" would turn into a permanent per-class veto (log-space -inf,
    # fusion.py) — but ONLY where the pixel passes the don't-care test
    # (retained sum > 0.5); don't-care pixels (e.g. all-zero padding
    # views) keep their zeros and stay skipped. The max(residual, 0)
    # guards u8-quantization sums slightly above 1.
    s = jnp.sum(vals, axis=-1, keepdims=True)
    floor = jnp.maximum(1.0 - s, 0.0) * np.float32(1.0 / (classes - k))
    # max, not where-on-retained: a RETAINED class stored as 0 (one-hot
    # maps keep zero-valued ranks) would otherwise still veto under mul
    return jnp.where(s <= 0.5, dense, jnp.maximum(dense, floor))


class TopKDensify:
    """Stable `predict_fn` for the fused scans: densify one view's top-k
    `(values, indices)` pair to a dense float32 (H, W, C) map inside
    `distributed.fuse_views(predict_fn=...)`. predict_fn is a static jit
    argument, so instances with equal `classes` compare and hash equal —
    re-constructing one never recompiles the scan."""

    __slots__ = ("classes", "__weakref__")  # jax jit caching weakrefs it

    def __init__(self, classes: int):
        self.classes = int(classes)

    def __call__(self, t):
        values, indices = t[0], t[1]
        return _densify_topk((values, indices), self.classes)

    def __eq__(self, other):
        return (
            isinstance(other, TopKDensify) and other.classes == self.classes
        )

    def __hash__(self):
        return hash(("probs_io.TopKDensify", self.classes))


@jax.jit
def _dequant_dense(probs: jax.Array) -> jax.Array:
    p = probs.astype(jnp.float32)
    if probs.dtype == jnp.uint8:
        p = p * np.float32(1.0 / 255.0)
    return p


def densify(loaded: Union[jax.Array, TopKProbs, np.ndarray]) -> jax.Array:
    """Dense float32 (H, W, C) map on device from any wire format."""
    if isinstance(loaded, TopKProbs):
        return _densify_topk((loaded.values, loaded.indices), loaded.classes)
    return _dequant_dense(jnp.asarray(loaded))
