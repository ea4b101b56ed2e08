"""Multi-view batched + multi-chip sharded render/fuse pipelines.

This is new capability relative to the reference, which streams one image at
a time on one GPU (ref: README.md:56-69; SURVEY.md §2c). TPU-native design:

- **Batched single-chip**: `fuse_views` lax-scans the jitted
  render->aggregate step over a stack of views, carrying the (P, C)
  accumulator in HBM. One compiled program, no host round trips.
- **Multi-chip**: `make_sharded_fuse` builds a shard_map over a
  `jax.sharding.Mesh` with axes:
    * `views`  — data parallelism over camera views; accumulator merged
      with `psum` over ICI (the merge operator for every aggregator is
      elementwise +; mul accumulates in log space).
    * `pixels` — spatial partitioning of each image's rows (the
      sequence-parallel analogue): each chip rasterizes only its row-band
      (the tile grid makes this exact, not approximate). The
      pixels-per-face weight mix needs image-global counts, so a (P,)
      `psum` over the `pixels` axis runs between the count pass and the
      weighted reduce.

The per-(image, primitive) count + weight semantics exactly match
fusion.MeshAggregator.add (ref: include/semantic_meshes/fusion/Mesh.h:90-103).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from . import fusion
from . import rasterize as rast


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Join the jax distributed runtime for multi-host pods.

    The reference has no distributed backend at all (SURVEY.md §2c); here
    multi-host scaling is the JAX runtime itself: ICI collectives within a
    pod slice, DCN across hosts. Call once per process before building a
    Mesh over jax.devices(). No-ops when already initialized or when env
    auto-detection (TPU pods set the coordinator automatically) applies.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_device_mesh(views_axis=None, pixels_axis=1, faces_axis=1):
    """Build a (views, pixels[, faces]) Mesh over all global devices.

    Defaults put every device on the 'views' (data-parallel) axis — the
    right layout when images are plentiful; set pixels_axis > 1 to split
    image rows across chips for very large frames, and faces_axis > 1 to
    split the MESH's triangles across chips (make_sharded_fuse rasterizes
    per-block and z-merges; for meshes whose rasterize working set
    outgrows one chip).
    """
    import jax

    devices = np.array(jax.devices())
    n = devices.size
    if views_axis is None:
        views_axis = n // (pixels_axis * faces_axis)
    if views_axis * pixels_axis * faces_axis != n:
        raise ValueError(
            f"views_axis * pixels_axis * faces_axis must equal device "
            f"count {n}"
        )
    if faces_axis > 1:
        return Mesh(
            devices.reshape(views_axis, pixels_axis, faces_axis),
            ("views", "pixels", "faces"),
        )
    return Mesh(
        devices.reshape(views_axis, pixels_axis), ("views", "pixels")
    )


def view_accumulate(prim_image, probs, weights, images_equal_weight,
                    num_primitives, aggregator, axis_name=None):
    """Fusion contribution of one view: (H, W) x (H, W, C) -> (P, C).

    Single fused segment reduction (MXU one-hot matmul for small P); see
    fusion._accumulate_view. If `axis_name` is given, segmented sums and
    pixels-per-face counts are psum'd together over that mesh axis (image
    rows sharded across chips)."""
    return fusion._accumulate_view(
        prim_image, probs, weights, images_equal_weight,
        num_primitives=num_primitives, aggregator=aggregator,
        axis_name=axis_name,
    )


def render_and_accumulate(vertices, faces, camera_arrays, probs, weights,
                          images_equal_weight, *, num_primitives, aggregator,
                          height, width, max_tris_per_tile=256,
                          prim_transform=None, axis_name=None, y_offset=None,
                          face_vertices=None, clip_near=False,
                          dense_e_cap=None, resample_grid=None,
                          tri_ids=None):
    """One fused render+aggregate step (stays entirely in HBM).

    camera_arrays: (rotation, translation, focal_lengths, principal_point).
    probs: (H, W, C) — note (H, W) layout here, not the public API's (W, H).
    tri_ids: optional (T,) int32 ids to emit per face row (rasterizer-level
    remap — free on the dense path, see dense.rasterize; per-pixel gather
    fallback elsewhere).

    prim_transform: optional fn(tri_index, z, camera_arrays) -> primitive
    ids (the texel-shader / cross-chip winner-merge hook — z lets a
    'faces'-sharded caller merge block winners by depth); default uses
    triangle ids directly.

    resample_grid: optional (H, W, 2) undistorted normalized ray coords
    of each DISTORTED pixel center (render._undistort_grid) — the caller
    then passes the virtual-pinhole (scaled) focal in camera_arrays, the
    rasterize + prim_transform run in pinhole space, and one coherent
    nearest-gather maps the primitive image back onto the distorted
    pixels BEFORE accumulation (so pixels-per-face counts and probs
    sampling both happen in the distorted frame — exactly what the
    per-view render() -> add() path fuses over). Mirrors
    render._render_triangles_distorted_jit in (H, W) layout.

    Returns ((P, C) fusion delta, overflow): overflow counts candidate
    pairs the rasterizer dropped under its static budgets this view. The
    reference never drops geometry (it grows mutex memory instead,
    ref: include/semantic_meshes/render/TriangleRenderer.h:68-72); our
    static-shape caps are only acceptable because every drop is counted
    and surfaced by the batched/sharded pipelines below.
    """
    rot, trans, fl, pp = camera_arrays
    tri, depth, overflow = rast.rasterize(
        vertices, faces, rot, trans, fl, pp,
        height=height, width=width, max_tris_per_tile=max_tris_per_tile,
        y_offset=0 if y_offset is None else y_offset,
        face_vertices=face_vertices, clip_near=clip_near,
        dense_e_cap=dense_e_cap, tri_ids=tri_ids,
    )
    if prim_transform is None:
        prim = jnp.where(tri >= 0, tri, num_primitives).astype(jnp.int32)
    else:
        prim = prim_transform(tri, depth, camera_arrays)
    if resample_grid is not None:
        px = fl[0] * resample_grid[..., 0] + pp[0]
        py = fl[1] * resample_grid[..., 1] + pp[1]
        ix = jnp.clip(px.astype(jnp.int32), 0, width - 1)
        iy = jnp.clip(py.astype(jnp.int32), 0, height - 1)
        # flat-linearized gather: 1.54x faster than the 2D advanced-index
        # form on v5e at 1024x768 (6.9 vs 10.7 ms/view standalone; same
        # elements, one fused index computation — docs/PERFORMANCE.md
        # "Distorted-camera overhead")
        lin = (iy * width + ix).reshape(-1)
        prim = prim.reshape(-1)[lin].reshape(iy.shape)
    delta = view_accumulate(
        prim, probs, weights, images_equal_weight,
        num_primitives, aggregator, axis_name=axis_name,
    )
    return delta, jnp.asarray(overflow, jnp.int32)


def _scan_classes(probs, predict_fn):
    """Class count of the scanned accumulator: probs' trailing dim, or the
    predictor's output width when views carry raw images — or any pytree
    the predictor densifies (e.g. stacked probs_io top-k (values, indices)
    pairs) — instead."""
    if predict_fn is None:
        return probs.shape[-1]
    struct = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), probs
    )
    out = jax.eval_shape(predict_fn, struct)
    return out.shape[-1]


def lens_shared(focal_lengths, principal_points, distortions):
    """Host-side check: True when every view carries identical
    (focal_lengths, principal_point, distortion) — the single-physical-
    camera case (a COLMAP workspace normally maps all images to one
    camera_id). The fused pipelines then hoist the undistortion grid out
    of the per-view scan (`shared_lens=True`): the grid costs ~1 ms/view
    (classic wire) to ~7 ms/view (extended wire, jvp Newton) at 1024x768
    on v5e, and recomputing an identical grid N times is pure waste.

    Reads VALUES of input arrays only (host numpy callers pay nothing;
    device arrays pay one tiny readback of already-materialized inputs,
    which does not serialize against queued computation). Call once per
    scene — plan_fuse does and stores it on the FusePlan."""
    if distortions is None:
        return False
    fl = np.asarray(focal_lengths)
    pp = np.asarray(principal_points)
    d = np.asarray(distortions)
    return bool(
        (fl == fl[:1]).all() and (pp == pp[:1]).all() and (d == d[:1]).all()
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_primitives", "aggregator", "height", "width",
        "max_tris_per_tile", "clip_near", "dense_e_cap", "predict_fn",
        "shared_lens",
    ),
)
def fuse_views(vertices, faces, rotations, translations, focal_lengths,
               principal_points, probs, images_equal_weight, weights=None,
               distortions=None, prim_remap=None, *,
               num_primitives, aggregator, height, width,
               max_tris_per_tile=256, clip_near=False, dense_e_cap=None,
               predict_fn=None, shared_lens=False):
    """Single-chip batched pipeline: scan render+fuse over N views.

    rotations (N,3,3), translations (N,3), focal_lengths/principal_points
    (N,2), probs (N,H,W,C), optional per-pixel weights (N,H,W). Returns
    (accumulator (P, C), overflow int32): pair the accumulator with
    fusion._get / MeshAggregator.state to read out distributions; overflow
    is the total candidate pairs dropped by the rasterizer's static
    budgets across all views (0 in a correctly-budgeted run — check it,
    dropped pairs mean missing geometry in the fusion).

    distortions: optional (N, 4|9) lens parameters (data.Camera.distortion
    — SIMPLE_RADIAL/RADIAL/OPENCV, COLMAP's default real-workspace
    models). Each view then renders under its virtual pinhole and
    resamples onto the distorted pixels inside the same scan body
    (render_and_accumulate resample_grid), so distorted scenes keep the
    one-program pipeline. Equals the per-view render() -> add() path.

    prim_remap: optional (T,) int32 map from face row to the primitive id
    to emit — how a uni-split plan (plan_fuse) returns its accumulator in
    original face order. Threaded into the rasterizer as `tri_ids`: ids
    ride the dense path's fragment-sort payload and packed candidate
    table, so the remap costs NOTHING per pixel (the earlier per-pixel
    gather variant measured ~5.7 ms/view at 1024x768 on v5e and ate the
    split's win); see FusePlan.

    predict_fn: optional traceable `(H, W, ...) image -> (H, W, C) probs`
    segmentation model. When given, `probs` carries the raw images and
    the model forward runs INSIDE the scan body — the whole
    predict+render+fuse pipeline is one compiled program with one
    dispatch per batch (the reference pays a host round trip per image
    per stage, ref: eval-scannet/eval_scannet.py:203-238). Must be a
    stable callable (it is part of the jit cache key).

    shared_lens (static): set True when every view has identical
    (focal_lengths, principal_point, distortion) — see `lens_shared` —
    to compute the undistortion grid ONCE before the scan instead of per
    view. Output is bit-identical (same grid values either way).
    """
    face_vertices = jnp.asarray(vertices, jnp.float32)[
        jnp.asarray(faces, jnp.int32)
    ]  # one gather for all views

    hoisted = None
    if shared_lens and distortions is not None:
        from .render import _undistort_grid

        hoisted = _undistort_grid(
            jnp.asarray(focal_lengths, jnp.float32)[0],
            jnp.asarray(principal_points, jnp.float32)[0],
            jnp.asarray(distortions, jnp.float32)[0],
            height=height, width=width,
        )

    def step(carry, view):
        acc, ov = carry
        rot, trans, fl, pp, pr, wt, dist = view
        if predict_fn is not None:
            pr = predict_fn(pr)
        grid = None
        if dist is not None:
            if hoisted is not None:
                grid, s = hoisted
            else:
                from .render import _undistort_grid

                grid, s = _undistort_grid(
                    fl, pp, dist, height=height, width=width
                )
            fl = fl * s
        delta, ov_view = render_and_accumulate(
            vertices, faces, (rot, trans, fl, pp), pr, wt,
            images_equal_weight,
            num_primitives=num_primitives, aggregator=aggregator,
            height=height, width=width, max_tris_per_tile=max_tris_per_tile,
            face_vertices=face_vertices, clip_near=clip_near,
            dense_e_cap=dense_e_cap, resample_grid=grid,
            tri_ids=prim_remap,
        )
        return (acc + delta, ov + ov_view), None

    acc0 = jnp.zeros(
        (num_primitives, _scan_classes(probs, predict_fn)), jnp.float32
    )
    (acc, overflow), _ = jax.lax.scan(
        step, (acc0, jnp.int32(0)),
        (rotations, translations, focal_lengths, principal_points, probs,
         weights, distortions),
    )
    return acc, overflow


class FusePlan:
    """Per-scene fusion plan from `plan_fuse`: the (possibly uni-permuted)
    faces to rasterize, the right-sized dense candidate budget, and —
    when the plan split — the (T,) map from permuted triangle ids back to
    original face ids (`remap[i] = perm[i]`, i.e. faces[remap] row i is
    the triangle the rasterizer calls i).

    The remap rides the rasterizer itself (fuse_views prim_remap ->
    dense.rasterize tri_ids): original ids are substituted where ids are
    BORN — the fragment-sort payload and the packed candidate table — so
    the accumulator lands in ORIGINAL face order at zero marginal cost,
    and z-ties break by lowest ORIGINAL id exactly like the unpermuted
    path. Two measured alternatives are deliberately not offered: a
    per-pixel (H, W) id gather inside the scan cost ~5.7 ms/view at
    1024x768 on v5e (the round-5 A/B: split 20.6 vs nosplit 22.7 MPix/s —
    it single-handedly ate the split's win), and un-permuting the (P, C)
    accumulator post-hoc pays the random row-gather rate (~340 ms at 500k
    faces).

    Probing, routing and the split-vs-compaction choice are per-scene
    host decisions with device syncs; the fused scan itself is pure
    device work. Splitting them lets a caller plan once and time or
    repeat `fuse_views_planned` without re-paying the probes (bench.py,
    the chunked demo, and any steady-state serving loop)."""

    __slots__ = ("faces", "dense_e_cap", "remap", "micro_max", "split_k",
                 "lens_shared")

    def __init__(self, faces, dense_e_cap, remap=None, micro_max=None,
                 split_k=0, lens_shared=False):
        self.faces = faces
        self.dense_e_cap = dense_e_cap
        self.remap = remap  # (T,) int32 permuted id -> original id
        self.micro_max = micro_max  # routing threshold probed (or None)
        self.split_k = split_k  # uni-prefix length (0 = no split)
        # all views share one physical camera -> the fused scan hoists the
        # undistortion grid (fuse_views shared_lens)
        self.lens_shared = lens_shared


def plan_fuse(vertices, faces, rotations, translations, focal_lengths,
              principal_points, *, height, width, backend=None,
              clip_near=False, micro_max=None, distortions=None,
              allow_split=True):
    """Probe a scene once and build the FusePlan every fusion entry point
    shares: batched candidate/routing stats (one `lax.scan` dispatch + one
    sync each — never per view), the SM_MICRO_MAX=auto routing pick, and
    the uni-slot-prefix-vs-micro-compaction gate (`dense.split_wins` —
    the two are mutually exclusive in rasterize(), and each wins on
    different scenes: the v5e A/B measured the split +6.5% on the
    all-micro dense preset but -17% on the scannet preset where it
    forfeits compaction).

    distortions: (N, 4|9) lens parameters (or None) — probes then run under
    each view's virtual-pinhole focal (render._distortion_scales), the
    focal the distorted render actually rasterizes with.

    allow_split: set False for texel-mode plans (texel ids come from
    per-face tables; the prefix permutation is whole-triangle only) and
    for callers that need per-pixel primitive ids in original face order.
    Non-dense backends get a no-op plan (no probes, no budget)."""
    faces_np = np.asarray(faces, np.int32)
    n_rows = faces_np.shape[0] * (2 if clip_near else 1)
    shared = lens_shared(focal_lengths, principal_points, distortions)
    if not rast.uses_dense(backend, faces_np.shape[0]):
        return FusePlan(jnp.asarray(faces_np), None, lens_shared=shared)

    from . import render as _render
    from .rasterize import dense as _dense

    fl = jnp.asarray(focal_lengths, jnp.float32)
    if distortions is not None and np.any(np.asarray(distortions)):
        s = _render._distortion_scales(
            fl, jnp.asarray(principal_points, jnp.float32),
            jnp.asarray(distortions, jnp.float32),
            height=height, width=width,
        )
        fl = fl * s[:, None]

    if micro_max is None and _dense.MICRO_AUTO:
        face_vertices = jnp.asarray(vertices, jnp.float32)[
            jnp.asarray(faces_np)
        ]
        curve = np.asarray(_render._dense_routing_probe(
            vertices, faces_np, face_vertices, rotations, translations,
            fl, principal_points, height=height, width=width,
            clip_near=clip_near,
        ))
        pairs, micro, micro_max = _dense.pick_route(curve, n_rows)
    else:
        stats = np.asarray(_dense.candidate_stats_batch(
            vertices, faces_np, rotations, translations, fl,
            principal_points, height=height, width=width,
            clip_near=clip_near, micro_max=micro_max,
        ))
        pairs, micro = int(stats[0]), int(stats[1])

    if allow_split and not clip_near:
        perm, k = _dense.uni_order(
            vertices, faces_np, rotations, translations, fl,
            principal_points, height=height, width=width,
        )
        if k and _dense.split_wins(k, n_rows, micro, micro_max):
            faces_p = jnp.asarray(faces_np[perm])
            pairs_s = int(np.asarray(_dense.candidate_stats_batch(
                vertices, faces_p, rotations, translations, fl,
                principal_points, height=height, width=width,
                micro_split=int(k), micro_max=micro_max,
            ))[0])
            return FusePlan(
                faces_p,
                (_dense.BUDGET_MARGIN * pairs_s, 0, micro_max, int(k)),
                remap=jnp.asarray(perm.astype(np.int32)),
                micro_max=micro_max, split_k=int(k), lens_shared=shared,
            )
    return FusePlan(
        jnp.asarray(faces_np),
        (_dense.BUDGET_MARGIN * pairs, _dense.BUDGET_MARGIN * micro,
         micro_max),
        micro_max=micro_max, lens_shared=shared,
    )


def fuse_views_planned(plan, vertices, rotations, translations,
                       focal_lengths, principal_points, probs,
                       images_equal_weight, weights=None, *,
                       num_primitives, aggregator, height, width,
                       **kwargs):
    """Run the batched fused scan under a FusePlan (one dispatch, no
    probes). The accumulator comes out in ORIGINAL face order even when
    the plan split (per-pixel id remap inside the scan — see FusePlan).
    Equals fuse_views(faces) exactly; see plan_fuse."""
    dists = kwargs.get("distortions")
    if dists is not None and plan.lens_shared:
        # re-verify against the ACTUAL batch: plans are documented as
        # reusable across fusions, and hoisting view 0's grid over a
        # later batch with mixed lenses would corrupt results silently —
        # the host-side compare is one tiny input read per call
        kwargs.setdefault(
            "shared_lens",
            lens_shared(focal_lengths, principal_points, dists),
        )
    return fuse_views(
        vertices, plan.faces, rotations, translations, focal_lengths,
        principal_points, probs, images_equal_weight, weights,
        num_primitives=num_primitives, aggregator=aggregator,
        height=height, width=width, dense_e_cap=plan.dense_e_cap,
        prim_remap=plan.remap,
        **kwargs,
    )


def fuse_views_split(vertices, faces, rotations, translations,
                     focal_lengths, principal_points, probs,
                     images_equal_weight, weights=None, *,
                     num_primitives, aggregator, height, width,
                     clip_near=False, micro_max=None, distortions=None,
                     **kwargs):
    """fuse_views with the dense path's uni-slot prefix, handled end to
    end: permute faces sub-pixel-first, right-size the pair budget at the
    split, run the fused scan, and un-permute the accumulator back to
    original face order — the result equals fuse_views while the micro
    fragment sorts pay ONE slot per sub-pixel triangle instead of
    micro_max^2. The split is applied only where `dense.split_wins` says
    it beats micro compaction (the two are mutually exclusive; measured
    +6.5% dense preset / -17% scannet preset if forced); otherwise this
    is plain fuse_views with right-sized compaction budgets — never
    slower than either fixed choice.

    This is plan_fuse + fuse_views_planned in one call (a few device
    syncs of host-side planning per scene, then one fused dispatch); use
    the two-step form to amortize planning over repeated fusions.
    clip_near is unsupported with the split (the prefix permutes faces,
    not clip pieces) — plan_fuse then plans compaction instead."""
    plan = plan_fuse(
        vertices, faces, rotations, translations, focal_lengths,
        principal_points, height=height, width=width,
        clip_near=clip_near, micro_max=micro_max, distortions=distortions,
    )
    return fuse_views_planned(
        plan, vertices, rotations, translations, focal_lengths,
        principal_points, probs, images_equal_weight, weights,
        num_primitives=num_primitives, aggregator=aggregator,
        height=height, width=width, clip_near=clip_near,
        **({} if distortions is None else {"distortions": distortions}),
        **kwargs,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_primitives", "aggregator", "height", "width",
        "max_tris_per_tile", "clip_near", "dense_e_cap", "predict_fn"
    ),
)
def fuse_views_texels(vertices, faces, resolutions, first_texel_index,
                      rotations, translations, focal_lengths,
                      principal_points, probs, images_equal_weight,
                      weights=None, distortions=None, *,
                      num_primitives, aggregator, height, width,
                      max_tris_per_tile=256, clip_near=False,
                      dense_e_cap=None, predict_fn=None, shared_lens=False):
    """Batched texel-mode pipeline: like fuse_views, but primitives are the
    sub-triangle texels of a TexelsRenderer (pass its reordered `faces`,
    `resolutions` and `first_texel_index`). Returns (accumulator (P, C),
    overflow int32) like fuse_views. distortions: optional (N, 4|9) lens
    parameters — texels shade in virtual-pinhole space, then the texel
    image resamples onto the distorted pixels (see fuse_views). predict_fn:
    see fuse_views — runs the segmentation forward inside the scan (probs
    then carries raw images). shared_lens (static): hoist the undistortion
    grid out of the scan when all views share intrinsics (see fuse_views /
    lens_shared)."""

    def prim_transform_factory(rot, trans, fl, pp):
        def prim_transform(tri, _z, camera_arrays):
            from .render import _texel_prim_image

            return _texel_prim_image(
                vertices, faces, rot, trans, fl, pp, tri,
                resolutions, first_texel_index, num_primitives,
                clip_near=clip_near,
            )
        return prim_transform

    face_vertices = jnp.asarray(vertices, jnp.float32)[
        jnp.asarray(faces, jnp.int32)
    ]

    hoisted = None
    if shared_lens and distortions is not None:
        from .render import _undistort_grid

        hoisted = _undistort_grid(
            jnp.asarray(focal_lengths, jnp.float32)[0],
            jnp.asarray(principal_points, jnp.float32)[0],
            jnp.asarray(distortions, jnp.float32)[0],
            height=height, width=width,
        )

    def step(carry, view):
        acc, ov = carry
        rot, trans, fl, pp, pr, wt, dist = view
        if predict_fn is not None:
            pr = predict_fn(pr)
        grid = None
        if dist is not None:
            if hoisted is not None:
                grid, s = hoisted
            else:
                from .render import _undistort_grid

                grid, s = _undistort_grid(
                    fl, pp, dist, height=height, width=width
                )
            fl = fl * s  # texel shading + resample both use the virtual fl
        delta, ov_view = render_and_accumulate(
            vertices, faces, (rot, trans, fl, pp), pr, wt,
            images_equal_weight,
            num_primitives=num_primitives, aggregator=aggregator,
            height=height, width=width, max_tris_per_tile=max_tris_per_tile,
            prim_transform=prim_transform_factory(rot, trans, fl, pp),
            face_vertices=face_vertices, clip_near=clip_near,
            dense_e_cap=dense_e_cap, resample_grid=grid,
        )
        return (acc + delta, ov + ov_view), None

    acc0 = jnp.zeros(
        (num_primitives, _scan_classes(probs, predict_fn)), jnp.float32
    )
    (acc, overflow), _ = jax.lax.scan(
        step, (acc0, jnp.int32(0)),
        (rotations, translations, focal_lengths, principal_points, probs,
         weights, distortions),
    )
    return acc, overflow


def make_sharded_fuse(mesh: Mesh, *, num_primitives, aggregator, height,
                      width, max_tris_per_tile=256,
                      shard_primitives=False, texel_params=None,
                      clip_near=False, dense_e_cap=None,
                      with_weights=False, with_distortion=False,
                      shared_lens=False):
    """Build a pjit-able multi-chip fuse step over `mesh`.

    Mesh axes used (any subset may have size 1):
      - 'views': views sharded across chips (data parallel)
      - 'pixels': image rows sharded across chips (spatial parallel)
      - 'faces' (optional third axis): TRIANGLES sharded across chips —
        each chip rasterizes only its contiguous block of T/D faces
        (binning sort, candidate table, per-triangle setup and the
        pre-expanded face_vertices all scale with the block), and the
        per-pixel winners merge across the axis with an exact
        lexicographic (z, primitive-id) minimum: one inverse-image pmin
        of the z bits, then one pmin of the block winners' ids masked to
        the global minimum (f32 bitcast to int32 is order-preserving for
        the non-negative depths the rasterizer emits; ties resolve to
        the lowest id, the same deterministic contract as one chip).
        This is INPUT-side mesh parallelism for meshes whose rasterize
        working set outgrows one chip, complementing shard_primitives
        (OUTPUT-side accumulator sharding). Requires T % faces_axis == 0
        (pad with degenerate faces like render._pad_faces does).

    Input/output sharding contract of the returned function:
      rotations (N,3,3) etc. sharded P('views'); probs (N,H,W,C) sharded
      P('views', 'pixels'); returns (accumulator, overflow): the
      fully-merged (P, C) accumulator — replicated, or sharded into
      P/n_chips-row blocks across ALL chips when
      shard_primitives=True (out_specs P(('views', 'pixels'))) — and
      the replicated int32 total of rasterizer-dropped candidate pairs,
      psum'd over both mesh axes (each chip rasterizes its own row band,
      so drops are per-(view, band)).

    shard_primitives=True is the huge-P memory mode: instead of carrying
    the full (P, C) accumulator on every chip and all-reducing it once at
    the end, each view's delta is merged with a per-view
    `psum_scatter` (ring reduce-scatter over 'views' — HALF the bytes of
    an all-reduce per merge) plus a local row-block slice over 'pixels',
    so the live scan carry is (P / n_chips, C). The full (P, C) exists
    only as the transient per-view delta (freed between views), cutting
    the live accumulator footprint ~2x and returning the result already
    sharded. Traffic tradeoff: (N/views_axis) per-view reduce-scatters vs
    one final all-reduce — prefer the default (False) when P fits
    comfortably and views are many; see docs/PERFORMANCE.md for the cost
    model.

    texel_params: optional (resolutions, first_texel_index) from a
    TexelsRenderer — primitives become sub-triangle texels (pass the
    renderer's reordered faces as `faces`).

    with_weights: when True the returned function takes a trailing per-pixel
    weights array (N, H, W), sharded P('views', 'pixels') like probs —
    API parity with the reference's 3-arg add
    (ref: include/semantic_meshes/fusion/Mesh.h:66,103).

    with_distortion: when True the returned function takes a trailing
    (N, 4|9) lens-parameter array sharded P('views') (after weights when
    both are set); each chip renders its views under their virtual
    pinholes and resamples onto the distorted pixels (see fuse_views).
    Incompatible with a 'pixels' axis > 1: the undistortion resample
    gathers across row bands, which a row-sharded rasterization cannot
    serve without materializing the full image per chip. shared_lens:
    build-time promise that every view shares (fl, pp, dist) — the
    undistortion grid is then computed once per chip instead of per view
    (see `lens_shared`).

    Requires: N % mesh.shape['views'] == 0, H % mesh.shape['pixels'] == 0,
    and P % n_chips == 0 (n_chips = the product of ALL mesh axis sizes,
    including 'faces' when present) when shard_primitives.
    """
    n_pixels = mesh.shape["pixels"]
    n_views = mesh.shape["views"]
    n_faces_axis = mesh.shape.get("faces", 1)
    if with_distortion and n_pixels > 1:
        raise ValueError(
            "with_distortion is incompatible with a 'pixels' mesh axis > 1 "
            "(the undistortion resample gathers across row bands); shard "
            "distorted scenes over 'views' (and optionally 'faces')"
        )
    local_h = height // n_pixels
    if local_h * n_pixels != height:
        raise ValueError(
            f"height {height} must divide by 'pixels' axis {n_pixels}"
        )
    n_chips = n_views * n_pixels * n_faces_axis
    if shard_primitives and num_primitives % n_chips != 0:
        raise ValueError(
            f"num_primitives ({num_primitives}) must divide by the total "
            f"chip count {n_chips} for shard_primitives"
        )

    if shard_primitives:
        out_axes = ("views", "pixels", "faces") if n_faces_axis > 1 \
            else ("views", "pixels")
        out_spec = (P(out_axes), P())
    else:
        out_spec = (P(), P())
    in_specs = (
        P(), P(),  # vertices, faces replicated
        P("views"), P("views"), P("views"), P("views"),
        P("views", "pixels"),  # probs: views x image rows
        P(),
    )
    if with_weights:
        in_specs = in_specs + (P("views", "pixels"),)
    if with_distortion:
        in_specs = in_specs + (P("views"),)

    def fuse_impl(vertices, faces, rotations, translations, focal_lengths,
                  principal_points, probs, images_equal_weight,
                  weights=None, distortions=None):
        row0 = jax.lax.axis_index("pixels") * local_h
        faces = jnp.asarray(faces, jnp.int32)
        res_blk, first_blk = texel_params if texel_params else (None, None)
        if n_faces_axis > 1:
            T = faces.shape[0]
            if T % n_faces_axis:
                raise ValueError(
                    f"face count {T} must divide by the 'faces' axis "
                    f"{n_faces_axis} (pad with degenerate faces)"
                )
            blk = T // n_faces_axis
            f0 = jax.lax.axis_index("faces") * blk
            faces = jax.lax.dynamic_slice_in_dim(faces, f0, blk, 0)
            if texel_params is not None:
                # first_texel_index carries GLOBAL texel offsets, so the
                # block's shader emits global primitive ids directly
                res_blk = jax.lax.dynamic_slice_in_dim(
                    jnp.asarray(res_blk, jnp.int32), f0, blk, 0
                )
                first_blk = jax.lax.dynamic_slice_in_dim(
                    jnp.asarray(first_blk, jnp.int32), f0, blk, 0
                )
        face_vertices = jnp.asarray(vertices, jnp.float32)[faces]

        def prim_transform_factory(rot, trans, fl, pp):
            """The prim_transform hook for this view.

            One of four shapes: identity (handled by render_and_accumulate
            itself), texel shade, faces-axis (z, triangle-id) winner merge,
            or merge-then-shade. The faces merge resolves the winner by
            (z bits, GLOBAL triangle id) — two (H_band, W) int32 pmins —
            so equal-z cross-block ties pick the lowest TRIANGLE id, the
            exact single-chip contract (in texel mode the winning
            triangle's owner chip then shades it, even when its
            resolution is 0 and the result is the don't-care sentinel; a
            third pmin broadcasts the owner's texel ids). f32->int32
            bitcast is order-preserving for the rasterizer's non-negative
            depths; empty pixels carry z=+inf on every chip."""
            if n_faces_axis == 1 and texel_params is None:
                return None

            def shade(tri):
                from .render import _texel_prim_image

                # the barycentric post-pass must sample GLOBAL pixel
                # rows (band-local tri image + row0 offset)
                return _texel_prim_image(
                    vertices, faces, rot, trans, fl, pp, tri,
                    res_blk, first_blk, num_primitives,
                    y_offset=row0, clip_near=clip_near,
                )

            def prim_transform(tri, z, camera_arrays):
                if n_faces_axis == 1:
                    return shade(tri)
                big = jnp.int32(2**31 - 1)
                f0 = jax.lax.axis_index("faces") * faces.shape[0]
                zbits = jax.lax.bitcast_convert_type(z, jnp.int32)
                tri_g = jnp.where(tri >= 0, tri + f0, big)
                zmin = jax.lax.pmin(zbits, "faces")
                tri_win = jax.lax.pmin(
                    jnp.where(zbits == zmin, tri_g, big), "faces"
                )
                if texel_params is None:
                    return jnp.where(
                        tri_win < big, tri_win, num_primitives
                    ).astype(jnp.int32)
                owned = (tri_win >= f0) & (tri_win < f0 + faces.shape[0])
                prim = shade(jnp.where(owned, tri_win - f0, -1))
                prim = jax.lax.pmin(
                    jnp.where(owned, prim, big), "faces"
                )
                return jnp.where(
                    prim < big, prim, num_primitives
                ).astype(jnp.int32)

            return prim_transform

        hoisted = None
        if shared_lens and with_distortion:
            from .render import _undistort_grid

            hoisted = _undistort_grid(
                focal_lengths[0], principal_points[0], distortions[0],
                height=local_h, width=width,
            )

        def step(carry, view):
            acc, ov = carry
            rot, trans, fl, pp, pr, wt, dist = view
            grid = None
            if dist is not None:
                # n_pixels == 1 here (checked at build): local_h is the
                # full height and row0 is 0, so the grid/render/resample
                # all see whole images
                if hoisted is not None:
                    grid, s = hoisted
                else:
                    from .render import _undistort_grid

                    grid, s = _undistort_grid(
                        fl, pp, dist, height=local_h, width=width
                    )
                fl = fl * s
            delta, ov_view = render_and_accumulate(
                vertices, faces, (rot, trans, fl, pp), pr, wt,
                images_equal_weight,
                num_primitives=num_primitives, aggregator=aggregator,
                height=local_h, width=width,
                max_tris_per_tile=max_tris_per_tile,
                axis_name="pixels", y_offset=row0,
                face_vertices=face_vertices,
                prim_transform=prim_transform_factory(rot, trans, fl, pp),
                clip_near=clip_near,
                dense_e_cap=dense_e_cap, resample_grid=grid,
            )
            if shard_primitives:
                # huge-P mode: merge THIS view's delta with a ring
                # reduce-scatter over 'views' (half an all-reduce's bytes)
                # and keep only this chip's row block along 'pixels'
                # (delta is already pixels-replicated — the per-view count
                # psum inside _accumulate_view merged the row bands — so
                # the pixels direction is a pure local slice, no traffic).
                # The scan carry never holds more than P / n_chips rows.
                delta = jax.lax.psum_scatter(
                    delta, "views", scatter_dimension=0, tiled=True
                )
                j = jax.lax.axis_index("pixels")
                if n_faces_axis > 1:  # delta is faces-replicated: slice
                    j = j * n_faces_axis + jax.lax.axis_index("faces")
                blk = num_primitives // n_chips
                delta = jax.lax.dynamic_slice_in_dim(
                    delta, j * blk, blk, axis=0
                )
            return (acc + delta, ov + ov_view), None

        p_rows = (
            num_primitives // n_chips if shard_primitives
            else num_primitives
        )
        acc0 = (
            jnp.zeros((p_rows, probs.shape[-1]), jnp.float32),
            jnp.int32(0),
        )
        (acc, overflow), _ = jax.lax.scan(
            step, acc0,
            (rotations, translations, focal_lengths, principal_points, probs,
             weights, distortions),
        )
        # Merge: each view's delta was already merged across 'pixels' inside
        # _accumulate_view (counts need the full image), so acc is replicated
        # along 'pixels' and only 'views' partials remain to sum — unless
        # shard_primitives already reduce-scattered them per view. Overflow
        # is per-(view, row-band): sum over both axes.
        if not shard_primitives:
            acc = jax.lax.psum(acc, "views")
        # drops are per-(view, row band[, face block])
        ov_axes = (
            ("views", "pixels", "faces") if n_faces_axis > 1
            else ("views", "pixels")
        )
        overflow = jax.lax.psum(overflow, ov_axes)
        return acc, overflow

    # shard_map needs a fixed positional arity matching in_specs: build the
    # wrapper for the (with_weights, with_distortion) combination requested
    if with_weights and with_distortion:
        def fuse(vertices, faces, rotations, translations, focal_lengths,
                 principal_points, probs, images_equal_weight, weights,
                 distortions):
            return fuse_impl(
                vertices, faces, rotations, translations, focal_lengths,
                principal_points, probs, images_equal_weight, weights,
                distortions,
            )
    elif with_weights:
        def fuse(vertices, faces, rotations, translations, focal_lengths,
                 principal_points, probs, images_equal_weight, weights):
            return fuse_impl(
                vertices, faces, rotations, translations, focal_lengths,
                principal_points, probs, images_equal_weight, weights,
            )
    elif with_distortion:
        def fuse(vertices, faces, rotations, translations, focal_lengths,
                 principal_points, probs, images_equal_weight, distortions):
            return fuse_impl(
                vertices, faces, rotations, translations, focal_lengths,
                principal_points, probs, images_equal_weight,
                distortions=distortions,
            )
    else:
        def fuse(vertices, faces, rotations, translations, focal_lengths,
                 principal_points, probs, images_equal_weight):
            return fuse_impl(
                vertices, faces, rotations, translations, focal_lengths,
                principal_points, probs, images_equal_weight,
            )

    return shard_map(
        fuse, mesh=mesh, in_specs=in_specs, out_specs=out_spec,
        check_vma=False,
    )
