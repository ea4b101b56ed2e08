"""Fusion: per-primitive class-distribution aggregation as segment reductions.

TPU-native rebuild of the reference's host-side OpenMP + mutex fusion
(ref: include/semantic_meshes/fusion/Mesh.h:45-133,
python/semantic_meshes/src/Fusion.cu:46-92). Design changes:

- Fusion runs **on device**: the reference copies every (primitive, probs,
  weights) image to host per `add` (python/semantic_meshes/include/Fusion.h:45-47);
  here `add` is a single jitted segment-reduction pass with a donated
  accumulator, so render -> fuse never leaves HBM.
- The per-primitive mutexes (Fusion.cu:58,71,85) are unnecessary: segment
  reductions are race-free and deterministic.
- Class count is a runtime constructor argument; jit specializes per
  (classes, primitives) — this deletes the reference's compile-time
  `-DCLASSES_NUMS` wall (Fusion.cu:120-128, README.md:108).

Aggregator semantics (all per Fusion.cu):
- "sum":    acc += probs * w;                get: L1-normalize, nan/inf->0
- "summax": keep only the argmax component of each pixel's probs (times w),
            then sum; same post-chain (Fusion.cu:46-64)
- "mul":    Bayesian product accumulated in log space: acc_log += w*log(probs);
            get: exp(acc - max) (logprob max-normalization, Fusion.h:97-104),
            then L1-normalize, nan/inf->0. Untouched primitives read as the
            uniform distribution (product identity == 1), matching the
            reference's LogProb behavior.

Per-pixel weight mix (Mesh.h:90-103): pixels_per_face counts *all* pixels of
a primitive in the image (don't-care included); then
  weight = images_equal_weight * (1 / pixels_per_face) + (1 - iew) * 1
times the optional per-pixel weights image. Pixels with sum(probs) <= 0.5
(don't-care, Mesh.h:98) and out-of-range primitive ids (Mesh.h:95, includes
the 0xFFFFFFFF background) are skipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ops

AGGREGATORS = ("sum", "summax", "mul")

DONT_CARE_THRESHOLD = 0.5  # ref: Mesh.h:98
_NEG_LARGE = -1e30  # finite stand-in for log(0); keeps segment sums NaN-free


def _flatten_inputs(primitive_indices, probs, weights, classes):
    prim = jnp.asarray(primitive_indices)
    probs = jnp.asarray(probs, jnp.float32)
    if prim.ndim != 2:
        raise ValueError(f"primitive image must be rank 2, got {prim.shape}")
    if probs.ndim != 3:
        raise ValueError(f"probs image must be rank 3, got {probs.shape}")
    if probs.shape[:2] != prim.shape:
        raise ValueError(
            f"Primitive image {prim.shape} and probs image {probs.shape} "
            "must have the same width and height"
        )
    if probs.shape[-1] != classes:
        raise ValueError(
            f"probs image has {probs.shape[-1]} classes, aggregator expects "
            f"{classes}"
        )
    if weights is not None:
        weights = jnp.asarray(weights, jnp.float32)
        if weights.shape != prim.shape:
            raise ValueError(
                f"Primitive image {prim.shape} and weights image "
                f"{weights.shape} must have the same width and height"
            )
    return prim, probs, weights


def _pixel_values(probs_flat, base_w, aggregator):
    """Per-pixel contribution rows (weight-mix NOT applied — it is linear,
    so it is applied post-segmentation; see _accumulate_view)."""
    if aggregator == "sum":
        return probs_flat * base_w[:, None]
    if aggregator == "summax":
        # keep only the argmax component (Fusion.cu:51-55)
        max_val = jnp.max(probs_flat, axis=-1, keepdims=True)
        is_max = probs_flat == max_val
        # exactly one winner per pixel: first max index (tt::argmax semantics)
        first_max = jnp.cumsum(is_max, axis=-1) == 1
        return jnp.where(is_max & first_max, probs_flat, 0.0) * base_w[:, None]
    if aggregator == "mul":
        # acc_log += w * log(probs); log(0) -> large negative, kept finite so
        # masked pixels (w == 0) contribute exactly 0.
        logp = jnp.maximum(jnp.log(jnp.maximum(probs_flat, 0.0)), _NEG_LARGE)
        return logp * base_w[:, None]
    if aggregator == "mul-split":
        # exact16-scatter form of "mul": the fixed-point scatter quantizes
        # in absolute terms of each column's max value, but log-probs span
        # [-1e30, 0]. Split w*logp into a near-field part (logp clipped at
        # -64, quantized at ~4e-6 absolute — the range where classes are
        # still in contention after max-normalization) and a far-field
        # tail (nonzero only for probs < e^-64, where exp has already
        # underflowed; its own column scale keeps annihilating magnitudes
        # annihilating). Columns [0:C] + [C:2C] sum to the "mul" values.
        logp = jnp.maximum(jnp.log(jnp.maximum(probs_flat, 0.0)), _NEG_LARGE)
        main = jnp.maximum(logp, -64.0)
        return jnp.concatenate(
            [main, logp - main], axis=1
        ) * base_w[:, None]
    raise ValueError(f"unknown aggregator {aggregator!r}")


def _accumulate_view(prim, probs, weights, images_equal_weight, *,
                     num_primitives, aggregator, axis_name=None):
    """Fusion contribution of one view as a SINGLE segment reduction.

    The reference weights each pixel by
      w = iew * (1 / pixels_per_face) + (1 - iew)          (Mesh.h:100-102)
    before accumulating. Every aggregator's accumulation is linear in w, and
    w is constant within a primitive, so the equivalent formulation
      S[p]     = sum over p's pixels of (pixel_w * value)
      count[p] = all pixels whose primitive is p (don't-care included)
      delta[p] = (iew / count[p] + (1 - iew)) * S[p]
    needs one fused segment-sum over (values | count-column) — which runs on
    the MXU for small P (ops.segment_sum). With `axis_name`, S and counts are
    psum'd together over that mesh axis (image rows sharded across chips).
    """
    P = num_primitives
    npix = prim.size
    C = probs.shape[-1]
    prim_flat = prim.reshape(npix)
    # uint32 0xFFFFFFFF and any id >= P are out of range (Mesh.h:95)
    if prim_flat.dtype in (jnp.uint32, jnp.uint64):
        in_range = prim_flat < jnp.asarray(P, prim_flat.dtype)
    else:
        in_range = (prim_flat >= 0) & (prim_flat < P)
    idx = jnp.where(in_range, prim_flat, P).astype(jnp.int32)

    probs_flat = probs.reshape(npix, C)
    not_dont_care = jnp.sum(probs_flat, axis=-1) > DONT_CARE_THRESHOLD
    pixel_w = jnp.ones((npix,), jnp.float32) if weights is None else \
        weights.reshape(npix)
    base_w = jnp.where(in_range & not_dont_care, pixel_w, 0.0)

    mul_split = (
        aggregator == "mul" and ops.effective_method(P) == "exact16"
    )
    values = _pixel_values(
        probs_flat, base_w, "mul-split" if mul_split else aggregator
    )
    # trailing column: pixels_per_face over ALL in-range pixels (Mesh.h:90-93)
    data = jnp.concatenate(
        [values, in_range.astype(jnp.float32)[:, None]], axis=1
    )
    seg = ops.segment_sum(data, idx, P)
    if mul_split:  # recombine near-field + far-field log sums
        seg = jnp.concatenate(
            [seg[:, :C] + seg[:, C:2 * C], seg[:, 2 * C:]], axis=1
        )
    if axis_name is not None:
        seg = jax.lax.psum(seg, axis_name)
    counts = seg[:, C]
    mix = images_equal_weight / jnp.maximum(counts, 1.0) + (
        1.0 - images_equal_weight
    )
    return mix[:, None] * seg[:, :C]


# NOTE: no buffer donation here — users may hold references to `.state`
# across add() calls (checkpointing, sharding), and donating the
# accumulator would invalidate them for a negligible memory win.
@functools.partial(
    jax.jit,
    static_argnames=("num_primitives", "aggregator"),
)
def _add(acc, prim, probs, weights, images_equal_weight, *, num_primitives,
         aggregator):
    """One fused pass: pixel weights + don't-care mask + segment reduce."""
    return acc + _accumulate_view(
        prim, probs, weights, images_equal_weight,
        num_primitives=num_primitives, aggregator=aggregator,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_primitives", "aggregator"),
)
def _add_many(acc, prims, probs, weights, images_equal_weight, *,
              num_primitives, aggregator):
    """Scan a batch of views through the fused per-view reduction."""

    def step(a, view):
        prim, pr, wt = view
        a = a + _accumulate_view(
            prim, pr, wt, images_equal_weight,
            num_primitives=num_primitives, aggregator=aggregator,
        )
        return a, None

    acc, _ = jax.lax.scan(step, acc, (prims, probs, weights))
    return acc


@functools.partial(jax.jit, static_argnames=("aggregator",))
def _get(acc, *, aggregator):
    """Read out fused distributions: post-chain per Fusion.cu:46-92."""
    if aggregator == "mul":
        # logprob_normalize: p / max_el(p) in log space (Fusion.h:97-104)
        m = jnp.max(acc, axis=-1, keepdims=True)
        probs = jnp.exp(acc - m)
    else:
        probs = acc
    total = jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs / total  # L1 normalize (may produce nan/inf on empty rows)
    return jnp.where(jnp.isfinite(probs), probs, 0.0)  # nan_and_inf_to_zero


@functools.partial(jax.jit, static_argnames=("background_is_scalar",))
def _model_render(annotations, prim, background, background_is_scalar=True):
    P = annotations.shape[0]
    prim_flat = prim
    if prim_flat.dtype in (jnp.uint32, jnp.uint64):
        in_range = prim_flat < jnp.asarray(P, prim_flat.dtype)
    else:
        in_range = (prim_flat >= 0) & (prim_flat < P)
    idx = jnp.where(in_range, prim_flat, 0).astype(jnp.int32)
    out = annotations[idx]  # (..., C)
    bg = background if not background_is_scalar else jnp.full(
        (annotations.shape[-1],), background, annotations.dtype
    )
    return jnp.where(in_range[..., None], out, bg)


class ModelRenderer:
    """Render fused annotations back into an image by primitive lookup.

    The reference has this in C++ but never exposes it to python
    (ref: Mesh.h:10-43; scripts re-do it with tf.gather,
    eval_scannet.py:314). Here it is first-class API.
    """

    def __init__(self, annotations):
        self.annotations = jnp.asarray(annotations)

    def render(self, primitive_indices, background=0.0):
        """primitive_indices: (...,) integer image -> (..., classes) image.

        Out-of-range ids (including the 0xFFFFFFFF background sentinel) get
        `background` (scalar or (classes,) vector).
        """
        prim = jnp.asarray(primitive_indices)
        bg = jnp.asarray(background, self.annotations.dtype)
        return _model_render(
            self.annotations, prim, bg, background_is_scalar=(bg.ndim == 0)
        )


class MeshAggregator:
    """Per-primitive class-probability aggregator.

    Constructor matches the reference factory exactly:
    `MeshAggregator(primitives, classes, aggregator="sum",
    images_equal_weight=0.5)` (ref: Fusion.cu:130-151). `aggregator` is
    case-insensitive on the first letter like the reference's capitalization
    shim (Fusion.cu:126).
    """

    def __init__(self, primitives, classes, aggregator="sum",
                 images_equal_weight=0.5):
        aggregator = str(aggregator).lower()
        if aggregator not in AGGREGATORS:
            raise ValueError(
                f"unknown aggregator {aggregator!r}; expected one of "
                f"{AGGREGATORS}"
            )
        self.primitives = int(primitives)
        self.classes = int(classes)
        self.aggregator = aggregator
        self.images_equal_weight = float(images_equal_weight)
        self._acc = jnp.zeros((self.primitives, self.classes), jnp.float32)

    # -- reference API ------------------------------------------------------

    def add(self, primitive_indices, probs, weights=None):
        """Fuse one view's predictions (device-resident, single jit call)."""
        prim, probs, weights = _flatten_inputs(
            primitive_indices, probs, weights, self.classes
        )
        self._acc = _add(
            self._acc,
            prim,
            probs,
            weights,
            jnp.float32(self.images_equal_weight),
            num_primitives=self.primitives,
            aggregator=self.aggregator,
        )

    def add_many(self, primitive_indices, probs, weights=None):
        """Fuse a batch of views in one compiled scan: primitive_indices
        (N, W, H), probs (N, W, H, C), optional weights (N, W, H). Same
        result as N sequential add() calls, one dispatch total."""
        prims = jnp.asarray(primitive_indices)
        probs = jnp.asarray(probs, jnp.float32)
        if prims.ndim != 3 or probs.ndim != 4 or \
                probs.shape[:3] != prims.shape:
            raise ValueError(
                f"add_many expects (N, W, H) + (N, W, H, C), got "
                f"{prims.shape} and {probs.shape}"
            )
        if probs.shape[-1] != self.classes:
            raise ValueError(
                f"probs batch has {probs.shape[-1]} classes, aggregator "
                f"expects {self.classes}"
            )
        if weights is not None:
            weights = jnp.asarray(weights, jnp.float32)
            if weights.shape != prims.shape:
                raise ValueError(
                    f"weights batch {weights.shape} must match "
                    f"{prims.shape}"
                )
        self._acc = _add_many(
            self._acc, prims, probs, weights,
            jnp.float32(self.images_equal_weight),
            num_primitives=self.primitives, aggregator=self.aggregator,
        )

    def reset(self):
        self._acc = jnp.zeros((self.primitives, self.classes), jnp.float32)

    def get(self):
        """Fused (primitives, classes) distributions as a device jax.Array."""
        return _get(self._acc, aggregator=self.aggregator)

    def renderer(self) -> ModelRenderer:
        """Snapshot into a ModelRenderer (ref: Mesh.h:124-129)."""
        return ModelRenderer(self.get())

    # -- TPU-native extensions ----------------------------------------------

    @property
    def state(self):
        """Serializable accumulator pytree — enables true fusion resume
        (SURVEY.md §5 checkpoint/resume)."""
        return self._acc

    @state.setter
    def state(self, value):
        value = jnp.asarray(value, jnp.float32)
        if value.shape != (self.primitives, self.classes):
            raise ValueError(
                f"state must be ({self.primitives}, {self.classes}), "
                f"got {value.shape}"
            )
        self._acc = value

    def merge(self, other_state):
        """Merge a partial accumulator from another shard/host. For every
        aggregator the merge operator is elementwise + (mul accumulates in
        log space, so + there too)."""
        self._acc = self._acc + jnp.asarray(other_state, jnp.float32)
