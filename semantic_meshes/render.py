"""Public render API: `triangles(mesh)` and `texels(mesh, cameras, tpp)`.

Parity with the reference python module `semantic_meshes.render`
(ref: python/semantic_meshes/src/Render.cu:12-25):

- `triangles(mesh)` -> renderer over whole-triangle primitives
  (ref: include/semantic_meshes/render/TriangleRenderer.h:11-95)
- `texels(mesh, colmap_or_camera_list[, texels_per_pixel=0.1])` -> renderer
  over sub-triangle texels
  (ref: include/semantic_meshes/render/TexturedTriangleRenderer.h:54-226)

`renderer.render(camera)` returns `(primitive_indices, depth)` as device
jax.Arrays shaped (width, height) — the reference's DLPack contract, where
consumers transpose to (H, W)
(ref: python/semantic_meshes/include/Renderer.h:25-43,
eval-scannet/eval_scannet.py:211-212). Empty pixels are 0xFFFFFFFF / +inf.

TPU-native design: rasterization is a tile-binned deterministic z-reduction
(rasterize/xla.py) instead of a mutex rasterizer; the texels-mode startup
precompute — O(triangles x cameras) host projections in the reference
(TexturedTriangleRenderer.h:93-147) — is a single vmapped device pass.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .data import Camera, Colmap, Ply, stack_cameras, stack_distortions
from . import rasterize as rast

logger = logging.getLogger("semantic_meshes")

INVALID_U32 = np.uint32(0xFFFFFFFF)


def _camera_hw(camera: Camera):
    # camera.resolution is (width, height); rasterizer works in (H, W)
    return camera.resolution[1], camera.resolution[0]


def _zero_budget(dense_e_cap):
    """True when the dense pair budget OR micro budget is pinned to zero
    (the probe frame saw none of that class, so ANY later occurrence
    spills) — such keys are breach-prone and re-check on the overflow
    policy's fixed duty cycle, not just the power-of-two schedule."""
    if dense_e_cap is None:
        return False
    if isinstance(dense_e_cap, tuple):
        return dense_e_cap[0] == 0 or dense_e_cap[1] == 0
    return dense_e_cap == 0


class _OverflowPolicy:
    """Overflow reporting without stalling dispatch.

    A hard int(overflow) sync on every render() blocks async dispatch
    (25 ms through a tunneled TPU; a pipeline bubble everywhere), and
    jax.debug.callback serializes dispatch as well. Overflow is a
    configuration property (candidate cap too small for this mesh at this
    resolution), so "first" checks synchronously once per resolution —
    catching misconfiguration on frame one — and stays async afterwards.
    Modes: "first" (default) | "always" | "never".

    Every frame's overflow scalar is additionally kept (device-resident,
    no sync) and summed on demand by total(): post-first-frame breaches
    can't pass silently — read renderer.overflow_total() at end-of-run
    (the eval harness prints it in its summary).
    """

    RECHECK_EVERY = 64

    def __init__(self, mode="first"):
        self.mode = mode
        self._calls = {}  # key -> number of check() calls so far
        self._pending = {}  # key -> per-frame device scalars (unsynced)
        self._base = {}  # key -> synced drop total
        self._warned = {}  # key -> drop total already reported
        self._dropped = set()  # keys with any detected drops so far

    def check(self, overflow, key, max_tris_per_tile, dense=False,
              recheck=False, hot=False):
        """Returns the number of NEW drops detected at this call (0 when
        the call stayed async or nothing new accrued) — the renderers use
        a nonzero return to invalidate the dense cap so the next frame
        re-probes and grows the budget.

        recheck: post-first-frame breaches are plausible for this key
        (every dense-path key: later frames can exceed the probe frame's
        budget) — in "first" mode, re-check synchronously at power-of-two
        call counts (frames 2, 3, 5, 9, 17, ...): any persistent breach
        is detected within ~2x its onset frame, yet a healthy stream pays
        only O(log N) total syncs, keeping steady-state dispatch fully
        async (a sync costs ~25 ms through a tunneled TPU AND breaks
        pipelining — CLAUDE.md).

        hot: this key is KNOWN breach-prone (a zero-pinned dense budget:
        the probe frame saw none of some candidate class, so ANY later
        occurrence spills) — re-check every RECHECK_EVERY frames as well,
        bounding detection latency to 64 frames instead of the
        power-of-two schedule's ~2x-onset. Keys with detected drops
        become hot automatically."""
        if self.mode == "never":
            return 0
        self._pending.setdefault(key, []).append(overflow)
        n = self._calls.get(key, 0)
        self._calls[key] = n + 1
        first = n == 0
        if (
            self.mode == "first"
            and not first
            and not (recheck and (
                (n & (n - 1)) == 0  # n is a power of two
                or ((hot or key in self._dropped)
                    and n % self.RECHECK_EVERY == 0)
            ))
        ):
            return 0
        # bookkeeping is per KEY (totals and the already-reported
        # watermark), so a warning never attributes one resolution's
        # drops to another and never re-reports drops the first-frame
        # check already printed
        total = self._key_total(key)  # one sync, drains this key's pending
        new = total - self._warned.get(key, 0)
        if not new:
            return 0
        self._warned[key] = total
        self._dropped.add(key)
        if first or self.mode == "always":
            knob = (
                "e_cap_rows/n_global (dense backend)" if dense
                else f"max_tris_per_tile (current {max_tris_per_tile})"
            )
            logger.warning(
                "rasterizer overflow: %d candidate pairs dropped; "
                "raise %s", new, knob,
            )
        else:
            logger.warning(
                "rasterizer overflow: %d candidate pairs dropped since "
                "the last check at %s; later frames exceed the probe "
                "frame — re-probe or set e_cap_rows explicitly", new, key,
            )
        return new

    def _key_total(self, key) -> int:
        pend = self._pending.get(key)
        if pend:
            self._base[key] = self._base.get(key, 0) + int(
                jnp.sum(jnp.stack(pend))
            )
            pend.clear()
        return self._base.get(key, 0)

    def total(self) -> int:
        """Accumulated dropped pairs across all renders so far.

        One device sync per call (stack + sum of the pending per-frame
        scalars) — intended for end-of-run summaries, not the hot loop.
        """
        for key in list(self._pending):
            self._key_total(key)
        return sum(self._base.values())


class _DenseCapPolicy:
    """Right-sizes the dense rasterizer's candidate budget per resolution.

    The dense path's dominant cost on micro-heavy meshes is the packed
    candidate-table gather, which pays per row of the STATIC e_cap budget
    (default 3 rows/triangle) — ~160 ms of sentinel rows at a 2M-triangle
    1024x768 view where the true candidate count is 0. Probe the exact
    count once per resolution (closed form, no sort — one ~25 ms sync,
    the same pattern as _OverflowPolicy) and specialize with a 2x margin.
    render_many probes the max over the whole batch (an exact bound); for
    single renders, later views that exceed 2x the probe frame's count
    spill to the overflow counter — and when the overflow policy's duty-
    cycle re-check detects the breach, the cap is invalidated so the next
    render re-probes and grows the budget (grow-only; see invalidate).
    """

    MARGIN = 2

    def __init__(self):
        self._cap = {}  # (H, W) -> (pair rows, micro rows)
        self._floor = {}  # (H, W) -> previous cap (grow-only re-probes)

    def lookup(self, key, probe):
        """probe() -> exact (pairs, micro[, micro_max]) counts for a
        representative view (syncs once). Returns the budget tuple; a
        trailing micro_max (the SM_MICRO_MAX=auto routing pick the counts
        were probed at) is carried through unscaled.

        A pair budget of 0 (every visible triangle is micro) makes the
        dense backend skip binning+streaming entirely; any later
        candidate at this resolution spills to the overflow counter. The
        micro budget right-sizes the fragment path the same way — rows
        past it also spill to overflow.
        """
        if key not in self._cap:
            vals = tuple(int(x) for x in np.asarray(probe()).ravel())
            floor = self._floor.get(key, (0, 0))
            self._cap[key] = (
                max(self.MARGIN * vals[0], floor[0]),
                max(self.MARGIN * vals[1], floor[1]),
            ) + vals[2:]
        return self._cap[key]

    def floor(self, key):
        """Grow-only budget floor for a key (nonzero after a breach): the
        auto-routing pick must know it — a nonzero pair floor keeps the
        binning sort alive even at zero probed pairs."""
        return self._floor.get(key, (0, 0))

    def invalidate(self, key):
        """Drop the cached budget so the next render re-probes (called by
        the renderers when the overflow policy detects post-probe drops).

        The floor for future re-probes is DOUBLE the breached cap (min
        256 rows): the re-probe uses whichever camera renders next, which
        with alternating small/large views may be a small one whose probe
        alone would re-pin the old budget — the geometric floor guarantees
        the budget converges past any fixed need in O(log) detected
        breaches either way, and grow-only means an oscillating scene
        can't thrash recompiles downward."""
        cap = self._cap.pop(key, None)
        if cap is not None:
            self._floor[key] = (
                max(2 * cap[0], 256),
                max(2 * cap[1], 256),
            )


def _size_bucket(t: int, floor: int) -> int:
    """Round a count up to a coarse bucket (<= ~25% padding, 8 buckets per
    power of two) so similar sizes share jit compilations."""
    if t <= floor:
        return floor
    step = 1 << max(t.bit_length() - 3, 8)
    return -(-t // step) * step


def _face_bucket(t: int) -> int:
    """Face/vertex-count bucket.

    Meshes of similar size then share every face-count-specialized jit
    compilation — a multi-scene eval loop would otherwise recompile each
    program per scene (compiles through a tunneled compile service cost
    ~30-130 s each).
    """
    return _size_bucket(t, 1024)


def _bucket_enabled(bucket) -> bool:
    if bucket is None:
        return os.environ.get("SM_FACE_BUCKETS", "") not in ("", "0")
    return bool(bucket)


def _pad_faces(faces, vertices):
    """Pad faces up to their bucket with degenerate all-zero-index rows.

    A padding face references vertex 0 three times: zero screen area, so
    the rasterizer's setup marks it invalid (denom == 0) and outputs are
    bit-identical to the unpadded mesh. Returns (padded_faces, real_count).
    """
    t = int(faces.shape[0])
    target = _face_bucket(t)
    if target == t or vertices.shape[0] == 0:
        return faces, t
    pad = jnp.zeros((target - t, 3), faces.dtype)
    return jnp.concatenate([faces, pad], axis=0), t


def _pad_vertices(vertices):
    """Pad the vertex count to its bucket with zero rows.

    Required for compile sharing: the vertex array's SHAPE is part of
    every jit cache key, so bucketing faces alone still recompiles per
    scene. Padding vertices never referenced by a face only adds unused
    projected lanes (vertex 0 exists in any non-empty mesh, and padding
    faces reference it, not the pad rows).
    """
    v = int(vertices.shape[0])
    target = _face_bucket(v)
    if target == v or v == 0:
        return vertices
    pad = jnp.zeros((target - v, vertices.shape[1]), vertices.dtype)
    return jnp.concatenate([vertices, pad], axis=0)


class TrianglesRenderer:
    """Whole-triangle primitive renderer (primitive index == triangle index).

    bucket: pad the face count to a coarse bucket so similar-sized meshes
    share jit compilations (None = SM_FACE_BUCKETS env; outputs are
    bit-identical either way — padding faces are degenerate).
    """

    def __init__(self, mesh: Ply, max_tris_per_tile: int = 256,
                 backend: str | None = None, clip_near: bool = False,
                 bucket: bool | None = None):
        self.mesh = mesh
        self.clip_near = bool(clip_near)
        self.vertices = jnp.asarray(mesh.vertices, jnp.float32)
        self.faces = jnp.asarray(mesh.faces, jnp.int32)
        self._num_faces = int(self.faces.shape[0])
        if _bucket_enabled(bucket):
            self.vertices = _pad_vertices(self.vertices)
            self.faces, _ = _pad_faces(self.faces, self.vertices)
        # pre-expanded face-vertex positions: per-view setup becomes
        # gather-free (rasterize.xla.setup_from_face_vertices)
        self.face_vertices = self.vertices[self.faces]
        self.max_tris_per_tile = int(max_tris_per_tile)
        self.backend = backend  # None = auto (xla/pallas/dense by size)
        self.overflow_policy = _OverflowPolicy()
        self.dense_cap_policy = _DenseCapPolicy()

    def getPrimitivesNum(self) -> int:
        return self._num_faces

    def _dense_e_cap(self, height, width, rot, trans, fl, pp, dist=None):
        """Adaptive candidate budget for the dense backend (None elsewhere
        or before the policy is consulted). rot..pp may be batched (N, ...)
        — the probe then takes the max over the batch. For distorted
        cameras pass `dist` so the probe sees the virtual-pinhole (scaled)
        focal the render actually rasterizes under — the micro/streaming
        routing depends on screen-space triangle size."""
        if not rast.uses_dense(self.backend, int(self.faces.shape[0])):
            return None
        rot = jnp.asarray(rot, jnp.float32)
        trans = jnp.asarray(trans, jnp.float32)
        fl = jnp.asarray(fl, jnp.float32)
        pp = jnp.asarray(pp, jnp.float32)
        if rot.ndim == 2:  # single camera -> batch of one
            rot, trans, fl, pp = rot[None], trans[None], fl[None], pp[None]
        if dist is not None and np.any(np.asarray(dist)):
            dist = jnp.asarray(dist, jnp.float32)
            if dist.ndim == 1:
                dist = jnp.broadcast_to(
                    dist, (rot.shape[0], dist.shape[0])
                )
            s = _distortion_scales(fl, pp, dist, height=height, width=width)
            fl = fl * s[:, None]
        from .rasterize import dense as _dense

        if _dense.MICRO_AUTO:
            # probe the full routing curve (max over the batch per
            # threshold), pick the cheapest threshold under the measured
            # cost model, and size the budgets at that threshold — still
            # ONE sync per resolution, same as the fixed-mode probe
            def probe():
                curve = np.asarray(_dense_routing_probe(
                    self.vertices, self.faces, self.face_vertices,
                    rot, trans, fl, pp,
                    height=height, width=width, clip_near=self.clip_near,
                ))
                rows = self.faces.shape[0] * (2 if self.clip_near else 1)
                return _dense.pick_route(
                    curve, rows,
                    min_pairs_budget=self.dense_cap_policy.floor(
                        (height, width)
                    )[0],
                )

            return self.dense_cap_policy.lookup((height, width), probe)
        return self.dense_cap_policy.lookup(
            (height, width),
            lambda: _dense_count_probe(
                self.vertices, self.faces, self.face_vertices,
                rot, trans, fl, pp,
                height=height, width=width, clip_near=self.clip_near,
            ),
        )

    def render(self, camera: Camera):
        height, width = _camera_hw(camera)
        dense_e_cap = self._dense_e_cap(
            height, width, camera.rotation, camera.translation,
            camera.focal_lengths, camera.principal_point,
            dist=camera.distortion,
        )
        if _has_distortion([camera]):
            indices, depth, overflow = _render_triangles_distorted_jit(
                self.vertices, self.faces, self.face_vertices,
                camera.rotation, camera.translation, camera.focal_lengths,
                camera.principal_point, camera.distortion,
                height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                backend=self.backend, clip_near=self.clip_near,
                dense_e_cap=dense_e_cap,
            )
        else:
            indices, depth, overflow = _render_triangles_jit(
                self.vertices, self.faces, self.face_vertices,
                camera.rotation, camera.translation, camera.focal_lengths,
                camera.principal_point,
                height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                backend=self.backend, clip_near=self.clip_near,
                dense_e_cap=dense_e_cap,
            )
        self._check_overflow(overflow, (height, width), dense_e_cap)
        return indices, depth  # (W, H) contract

    def _check_overflow(self, overflow, key, dense_e_cap):
        """Overflow policy check + automatic dense-budget regrowth: every
        dense-path key rechecks at the policy's low duty cycle, and any
        detected post-probe drop invalidates the cached cap so the NEXT
        render re-probes with a grow-only budget (the reference never
        drops geometry — it grows mutex memory,
        ref: include/semantic_meshes/render/TriangleRenderer.h:68-72; here
        a breach is at worst visible for one duty-cycle window, counted,
        and then self-heals at the cost of one re-probe + recompile)."""
        new = self.overflow_policy.check(
            overflow, key, self.max_tris_per_tile,
            dense=(dense_e_cap is not None),
            recheck=(dense_e_cap is not None),
            hot=_zero_budget(dense_e_cap),
        )
        if new and dense_e_cap is not None:
            self.dense_cap_policy.invalidate(key)

    def overflow_total(self) -> int:
        """Total dropped candidate pairs across all renders (syncs once)."""
        return self.overflow_policy.total()

    def prepare(self, cameras):
        """Pre-size the adaptive candidate budgets for a full camera set.

        Sequential `render(cam)` calls size the dense backend's candidate
        budget from the FIRST camera they see at each resolution; a later
        camera that exceeds the 2x margin spills to the overflow counter
        and triggers a self-heal (re-probe + recompile — 10-100+ s through
        a tunneled compile service). When the camera set is known upfront
        (the demo scripts and eval all have it), calling prepare() probes
        the max budget over ALL cameras in one batched dispatch + one sync
        — per-frame renders then never breach, never resync, and compile
        exactly one program per resolution (stable across runs, so the
        persistent compile cache hits). Groups mixed resolutions
        automatically; a no-op for non-dense backends.
        """
        cams = list(cameras)
        by_hw = {}
        for c in cams:
            by_hw.setdefault(_camera_hw(c), []).append(c)
        for (height, width), group in by_hw.items():
            rot, trans, fl, pp = stack_cameras(group)
            self._dense_e_cap(
                height, width, rot, trans, fl, pp,
                dist=stack_distortions(group)
                if _has_distortion(group) else None,
            )

    def render_many(self, cameras):
        """Render a batch of same-resolution cameras in one compiled scan.

        Returns (indices (N, W, H) uint32, depth (N, W, H) f32). TPU-native
        extension: amortizes dispatch and keeps the whole batch on device.
        """
        cams = list(cameras)
        height, width = _camera_hw(cams[0])
        if any(_camera_hw(c) != (height, width) for c in cams):
            raise ValueError("render_many needs equal camera resolutions")
        rot, trans, fl, pp = stack_cameras(cams)
        dense_e_cap = self._dense_e_cap(
            height, width, rot, trans, fl, pp,
            dist=stack_distortions(cams) if _has_distortion(cams) else None,
        )
        if _has_distortion(cams):
            idx, depth, overflow = _render_scan_distorted(
                self.vertices, self.faces, self.face_vertices, rot, trans,
                fl, pp, stack_distortions(cams), height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                backend=self.backend, clip_near=self.clip_near,
                dense_e_cap=dense_e_cap,
            )
            self._check_overflow(overflow, (height, width), dense_e_cap)
            return idx.astype(jnp.uint32), depth
        tri, depth, overflow = _render_scan(
            self.vertices, self.faces, self.face_vertices, rot, trans, fl,
            pp, height=height, width=width,
            max_tris_per_tile=self.max_tris_per_tile,
            backend=self.backend, clip_near=self.clip_near,
            dense_e_cap=dense_e_cap,
        )
        self._check_overflow(overflow, (height, width), dense_e_cap)
        return (
            tri.astype(jnp.uint32).transpose(0, 2, 1),
            depth.transpose(0, 2, 1),
        )


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near")
)
def _dense_count_probe(vertices, faces, face_vertices, rot, trans, fl, pp,
                       *, height, width, clip_near):
    """Max dense-path (pair, micro) counts over a camera batch as a (2,)
    device array. O(T) per camera, no sort — the _DenseCapPolicy probe."""
    def step(m, cam):
        r, t, f, p = cam
        c = rast.dense_candidate_stats(
            vertices, faces, r, t, f, p, face_vertices=face_vertices,
            height=height, width=width, clip_near=clip_near,
        )
        return jnp.maximum(m, c), None

    m, _ = jax.lax.scan(
        step, jnp.zeros((2,), jnp.int32), (rot, trans, fl, pp)
    )
    return m


@functools.partial(
    jax.jit, static_argnames=("height", "width", "clip_near")
)
def _dense_routing_probe(vertices, faces, face_vertices, rot, trans, fl, pp,
                         *, height, width, clip_near):
    """Max (pairs, micro) per routing threshold over a camera batch as a
    (len(ROUTING_THRESHOLDS), 2) device array — the SM_MICRO_MAX=auto
    probe (O(T) per camera per threshold, no sort)."""
    def step(m, cam):
        r, t, f, p = cam
        c = rast.dense_routing_stats(
            vertices, faces, r, t, f, p, face_vertices=face_vertices,
            height=height, width=width, clip_near=clip_near,
        )
        return jnp.maximum(m, c), None

    from .rasterize import dense as _dense

    m, _ = jax.lax.scan(
        step,
        jnp.zeros((len(_dense.ROUTING_THRESHOLDS), 2), jnp.int32),
        (rot, trans, fl, pp),
    )
    return m


def _texel_resolutions(vertices, faces, cameras, texels_per_pixel,
                       clip_near=False, bucket=False):
    """Per-triangle texel grid resolution r = ceil(tpp * sqrt(max screen area)).

    Vectorized equivalent of the reference's host OpenMP loop over
    (triangles x cameras) (ref: TexturedTriangleRenderer.h:93-127): a camera
    contributes a triangle's screen-space area iff any vertex is in front of
    it and all three projected vertices fall within the 0.5-resolution border
    around the image.

    clip_near: size triangles that straddle the near plane by the projected
    area of their clipped (in-front) pieces, with coordinates clamped to the
    same 0.5-resolution border box (a straddling triangle's raw projection
    is unbounded). Without this, straddling-everywhere triangles would get
    resolution 0 and render as invalid even though the clipped rasterizer
    covers them.
    """
    rot, trans, fl, pp = stack_cameras(cameras)
    resolutions = np.asarray([c.resolution for c in cameras], np.float32)  # (C,2)
    if bucket:
        # pad the camera COUNT to its bucket too (this program is also
        # specialized on it). Dummy cameras have resolution (0, 0): their
        # border box is empty, so they contribute zero area in both the
        # reference and the clipped sizing rule.
        c = len(cameras)
        target = _size_bucket(c, 16)
        if target != c:
            n = target - c
            rot = np.concatenate(
                [rot, np.broadcast_to(np.eye(3, dtype=np.float32),
                                      (n, 3, 3))], axis=0)
            trans = np.concatenate([trans, np.zeros((n, 3), np.float32)])
            fl = np.concatenate([fl, np.ones((n, 2), np.float32)])
            pp = np.concatenate([pp, np.zeros((n, 2), np.float32)])
            resolutions = np.concatenate(
                [resolutions, np.zeros((n, 2), np.float32)])
    return _texel_resolutions_jit(
        vertices, faces, rot, trans, fl, pp, resolutions,
        texels_per_pixel=float(texels_per_pixel), clip_near=clip_near,
    )


# module-level jit: a per-construction inner jit would re-trace (and through
# a tunneled compile service, re-COMPILE ~30 s) for every TexelsRenderer
@functools.partial(
    jax.jit, static_argnames=("texels_per_pixel", "clip_near")
)
def _texel_resolutions_jit(vertices, faces, rot, trans, fl, pp, resolutions,
                           *, texels_per_pixel, clip_near):
    def compute(vertices, faces, rot, trans, fl, pp, resolutions):
        face_vertices = vertices[faces]  # (T, 3, 3), gathered once

        def per_camera(max_area, cam_args):
            rot, trans, fl, pp, res = cam_args
            flat = face_vertices.reshape(-1, 3)
            cam = geometry.rigid_transform(rot, trans, flat)
            border = 0.5
            lo = -border * res
            hi = (1.0 + border) * res
            if clip_near:
                from .rasterize.xla import CLIP_Z_NEAR

                p = geometry.pinhole_project(fl, pp, cam).reshape(-1, 3, 2)
                z = cam[..., 2].reshape(-1, 3)
                all_front = jnp.all(z > CLIP_Z_NEAR, axis=-1)
                inside = jnp.all((p >= lo) & (p < hi), axis=(-2, -1))
                area_ref = jnp.where(
                    all_front & inside, geometry.triangle_screen_area(p), 0.0
                )
                pieces, valid = geometry.clip_triangles_near(
                    cam.reshape(-1, 3, 3), CLIP_Z_NEAR
                )  # (T, 2, 3, 3), (T, 2)
                pc = geometry.pinhole_project(
                    fl, pp, pieces.reshape(-1, 3)
                ).reshape(-1, 2, 3, 2)
                # clamp into the border box: a straddling triangle's clipped
                # piece can project arbitrarily far outside the image; the
                # clamped area is a bounded proxy for its on-screen footprint
                pc = jnp.clip(pc, lo, hi)
                piece_area = geometry.triangle_screen_area(
                    pc.reshape(-1, 3, 2)
                ).reshape(-1, 2)
                area_clip = jnp.sum(
                    jnp.where(valid, piece_area, 0.0), axis=-1
                )
                # triangles the reference rule can size keep its sizing;
                # straddlers AND partially-out-of-frame triangles (which the
                # reference rule zeroes, leaving visible pixels invalid when
                # the camera is inside the scene) use the clamped-piece proxy
                area = jnp.where(area_ref > 0, area_ref, area_clip)
            else:
                p = geometry.pinhole_project(fl, pp, cam).reshape(-1, 3, 2)
                z = cam[..., 2].reshape(-1, 3)
                in_front = jnp.any(z > 0, axis=-1)
                inside = jnp.all((p >= lo) & (p < hi), axis=(-2, -1))
                area = geometry.triangle_screen_area(p)
                area = jnp.where(in_front & inside, area, 0.0)
            # scan with a running max: memory stays O(T) however many
            # cameras the workspace has (the vmap formulation materializes
            # (cameras, T) — gigabytes for eval-scale camera sets)
            return jnp.maximum(max_area, area), None

        max_area, _ = jax.lax.scan(
            per_camera,
            jnp.zeros(faces.shape[0], jnp.float32),
            (rot, trans, fl, pp, resolutions),
        )
        return jnp.ceil(
            texels_per_pixel * jnp.sqrt(max_area)
        ).astype(jnp.int32)

    return compute(vertices, faces, rot, trans, fl, pp, resolutions)


class TexelsRenderer:
    """Sub-triangle texel renderer: each triangle is subdivided into an
    r x r triangular grid of texels (r(r+1)/2 primitives), decoupling fusion
    resolution from triangle size (the paper's texel mode)."""

    def __init__(self, mesh: Ply, cameras, texels_per_pixel: float = 0.1,
                 max_tris_per_tile: int = 256, backend: str | None = None,
                 clip_near: bool = False, bucket: bool | None = None):
        self.clip_near = bool(clip_near)
        self.backend = backend
        self.overflow_policy = _OverflowPolicy()
        self.dense_cap_policy = _DenseCapPolicy()
        if isinstance(cameras, Colmap):
            cameras = cameras.getCameras()
        cameras = list(cameras)
        if not cameras:
            raise ValueError("texels renderer needs at least one camera")
        self.mesh = mesh
        self.vertices = jnp.asarray(mesh.vertices, jnp.float32)
        self.max_tris_per_tile = int(max_tris_per_tile)

        raw_faces = jnp.asarray(mesh.faces, jnp.int32)
        self._num_faces = int(raw_faces.shape[0])
        bucketed = _bucket_enabled(bucket)
        if bucketed:
            # pad BEFORE the jitted setup programs so they are shared
            # across similar-sized scenes too; padding faces get zero
            # screen area -> resolution 0 -> zero texels, so the texel id
            # space and all render outputs are unchanged
            self.vertices = _pad_vertices(self.vertices)
            raw_faces, _ = _pad_faces(raw_faces, self.vertices)

        res = _texel_resolutions(
            self.vertices, raw_faces, cameras,
            float(texels_per_pixel), clip_near=self.clip_near,
            bucket=bucketed,
        )
        # Reorder face vertices so the most-right-angled vertex maps to
        # uv (0, 0) (ref: TexturedTriangleRenderer.h:129-146). Internal only:
        # unlike the reference we do not mutate the shared Ply's face array.
        self.faces = geometry.reorder_faces_for_texels(
            self.vertices, raw_faces
        )
        self.face_vertices = self.vertices[self.faces]
        self.resolutions = res  # (T,) int32
        counts = np.asarray(geometry.texel_count(res), np.int64)  # (T,)
        first = np.zeros(len(counts) + 1, np.int64)
        np.cumsum(counts, out=first[1:])
        self.first_texel_index = jnp.asarray(first[:-1], jnp.int32)
        self._primitive_num = int(first[-1])
        num_without = int(np.sum(counts[: self._num_faces] == 0))
        logger.info(
            "Got %d triangles, %d texels and %d triangles without texels",
            self._num_faces,
            self._primitive_num,
            num_without,
        )

    def getPrimitivesNum(self) -> int:
        return self._primitive_num

    # identical attribute contract (vertices/faces/face_vertices/backend/
    # clip_near/dense_cap_policy) -> share the adaptive-budget helper and
    # the whole-set budget probe (kills mid-loop recompiles, round 4)
    _dense_e_cap = TrianglesRenderer._dense_e_cap
    prepare = TrianglesRenderer.prepare

    def render(self, camera: Camera):
        height, width = _camera_hw(camera)
        dense_e_cap = self._dense_e_cap(
            height, width, camera.rotation, camera.translation,
            camera.focal_lengths, camera.principal_point,
            dist=camera.distortion,
        )
        if _has_distortion([camera]):
            indices, depth, overflow = _render_texels_distorted_jit(
                self.vertices, self.faces, self.face_vertices,
                self.resolutions, self.first_texel_index,
                camera.rotation, camera.translation, camera.focal_lengths,
                camera.principal_point, camera.distortion,
                height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                backend=self.backend, num_primitives=self._primitive_num,
                clip_near=self.clip_near, dense_e_cap=dense_e_cap,
            )
        else:
            indices, depth, overflow = _render_texels_jit(
                self.vertices, self.faces, self.face_vertices,
                self.resolutions, self.first_texel_index,
                camera.rotation, camera.translation, camera.focal_lengths,
                camera.principal_point,
                height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                backend=self.backend, num_primitives=self._primitive_num,
                clip_near=self.clip_near, dense_e_cap=dense_e_cap,
            )
        self._check_overflow(overflow, (height, width), dense_e_cap)
        return indices, depth  # (W, H) contract

    _check_overflow = TrianglesRenderer._check_overflow
    overflow_total = TrianglesRenderer.overflow_total
    prepare = TrianglesRenderer.prepare

    def render_many(self, cameras):
        """Batched texel-mode render (one compiled scan; see
        TrianglesRenderer.render_many)."""
        cams = list(cameras)
        height, width = _camera_hw(cams[0])
        if any(_camera_hw(c) != (height, width) for c in cams):
            raise ValueError("render_many needs equal camera resolutions")
        rot, trans, fl, pp = stack_cameras(cams)
        dense_e_cap = self._dense_e_cap(
            height, width, rot, trans, fl, pp,
            dist=stack_distortions(cams) if _has_distortion(cams) else None,
        )
        if _has_distortion(cams):
            idx, depth, overflow = _render_texels_scan_distorted(
                self.vertices, self.faces, self.face_vertices,
                self.resolutions, self.first_texel_index, rot, trans, fl,
                pp, stack_distortions(cams), height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                num_primitives=self._primitive_num, backend=self.backend,
                clip_near=self.clip_near, dense_e_cap=dense_e_cap,
            )
        else:
            idx, depth, overflow = _render_texels_scan(
                self.vertices, self.faces, self.face_vertices,
                self.resolutions, self.first_texel_index, rot, trans, fl,
                pp, height=height, width=width,
                max_tris_per_tile=self.max_tris_per_tile,
                num_primitives=self._primitive_num, backend=self.backend,
                clip_near=self.clip_near, dense_e_cap=dense_e_cap,
            )
        self._check_overflow(overflow, (height, width), dense_e_cap)
        return idx, depth


def _texel_prim_image(vertices, faces, rotation, translation, focal_lengths,
                      principal_point, tri_index, resolutions,
                      first_texel_index, num_primitives, y_offset=0,
                      clip_near=False):
    """Texel primitive ids as int32 (invalid pixels -> num_primitives).

    Equivalent of TexturedTriangle::getTexelIndex in the CUDA shader
    (ref: TexturedTriangleRenderer.h:31-41), run as a post-pass over the
    winning fragments. Pixels on triangles with resolution 0 (never seen by
    any setup camera) are invalid rather than colliding with a neighbor's
    first texel. Shared by the public render API and the batched fusion
    pipeline (distributed.fuse_views_texels).

    Layout: the perspective-correct uv of a pixel is a ratio of affine
    forms, u = A1(x,y)/S(x,y), v = A2(x,y)/S(x,y) with A_i = w_i * inv_z_i
    and S = sum_j A_j, so the whole shader needs ONE packed 12-lane row per
    pixel (vs 6 separate gathers of faces/vertices/z, which dominated texel
    render time ~4x).

    clip_near: build the affine forms from camera-space vertices instead of
    projected ones. For the pixel ray d(x,y) = ((x-cx)/fx, (y-cy)/fy, 1) the
    unnormalized barycentric of the hit point w.r.t. vertex i is
    d . (V_j x V_k) — affine in (x, y) and valid even when a vertex sits
    behind the camera (where the projected-vertex form is meaningless). So
    no clipped-piece barycentric remapping is needed: the rasterizer's
    original-triangle ids index a per-TRIANGLE table as usual.
    """
    from .rasterize import xla as rx

    faces = jnp.asarray(faces, jnp.int32)
    if clip_near:
        cam = geometry.rigid_transform(
            jnp.asarray(rotation, jnp.float32),
            jnp.asarray(translation, jnp.float32),
            jnp.asarray(vertices, jnp.float32),
        )
        v_cam = cam[faces]  # (T, 3, 3)
        fl = jnp.asarray(focal_lengths, jnp.float32)
        pp = jnp.asarray(principal_point, jnp.float32)

        def aff_ray(j, k):  # d . (V_j x V_k) as an affine form in (x, y)
            n = jnp.cross(v_cam[:, j], v_cam[:, k])  # (T, 3)
            a = n[:, 0] / fl[0]
            b = n[:, 1] / fl[1]
            c = n[:, 2] - pp[0] * a - pp[1] * b
            return (a, b, c)

        a0 = aff_ray(1, 2)
        a1 = aff_ray(2, 0)
        a2 = aff_ray(0, 1)
    else:
        pix, z_cam = rx.project_vertices(
            jnp.asarray(vertices, jnp.float32),
            jnp.asarray(rotation, jnp.float32),
            jnp.asarray(translation, jnp.float32),
            jnp.asarray(focal_lengths, jnp.float32),
            jnp.asarray(principal_point, jnp.float32),
        )
        setup = rx._triangle_setup(pix, z_cam, faces)
        inv_z = 1.0 / jnp.maximum(z_cam[faces], rx.Z_NEAR)  # (T, 3)

        def aff(i):  # A_i coefficients: (a_i, b_i, c_i) * inv_z_i
            return (
                setup["a"][:, i] * inv_z[:, i],
                setup["b"][:, i] * inv_z[:, i],
                setup["c"][:, i] * inv_z[:, i],
            )

        a0 = aff(0)
        a1 = aff(1)
        a2 = aff(2)
    s = tuple(a0[k] + a1[k] + a2[k] for k in range(3))
    # The table rides INT32 lanes (float coefficient bits bitcast in,
    # bitcast back after the gather): integer gathers move bits inertly
    # on every backend, while TPU f32 gathers can canonicalize NaNs and
    # flush denormals in some fused lowerings — which would zero the
    # int32 resolution/first-texel columns (the exact failure
    # render._resample_wh hit in round 5; this gather measured bit-exact
    # at 100k x 1.25M on v5e, but the safety is free).
    cols = [
        jax.lax.bitcast_convert_type(c, jnp.int32)
        for c in list(a1) + list(a2) + list(s)
    ]
    cols.append(jnp.asarray(resolutions, jnp.int32))
    cols.append(jnp.asarray(first_texel_index, jnp.int32))
    table = jnp.stack(cols, axis=-1)  # (T, 11) int32

    height, width = tri_index.shape
    tri = jnp.maximum(tri_index, 0)
    row = table[tri]  # (H, W, 11) — the single per-pixel gather
    coef = jax.lax.bitcast_convert_type(row[..., :9], jnp.float32)
    py = (
        jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
        + jnp.asarray(y_offset, jnp.float32)
    )
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    s_val = coef[..., 6] * px + coef[..., 7] * py + coef[..., 8]
    u = (coef[..., 0] * px + coef[..., 1] * py + coef[..., 2]) / s_val
    v = (coef[..., 3] * px + coef[..., 4] * py + coef[..., 5]) / s_val
    res = row[..., 9]
    first = row[..., 10]
    rel = geometry.texel_index_uv(u, v, jnp.maximum(res, 1))
    prim = first + rel
    valid = (tri_index >= 0) & (res >= 1)
    return jnp.where(valid, prim, num_primitives).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("num_primitives", "clip_near")
)
def _texel_indices(vertices, faces, rotation, translation, focal_lengths,
                   principal_point, tri_index, resolutions, first_texel_index,
                   num_primitives, clip_near=False):
    """uint32 texel image with the 0xFFFFFFFF background sentinel
    (public render contract, ref: TriangleRenderer.h:75-78)."""
    prim = _texel_prim_image(
        vertices, faces, rotation, translation, focal_lengths,
        principal_point, tri_index, resolutions, first_texel_index,
        num_primitives, clip_near=clip_near,
    )
    return jnp.where(
        prim < num_primitives,
        prim.astype(jnp.uint32),
        jnp.uint32(0xFFFFFFFF),
    )


# --------------------------------------------------------------------------
# Lens distortion (SIMPLE_RADIAL / RADIAL / OPENCV cameras)
# --------------------------------------------------------------------------
#
# TPU-first design: the rasterizers stay pinhole-only (straight triangle
# edges are what makes tiled rasterization work), and a distorted view is
# rendered as (1) a pinhole render under a per-camera *virtual* pinhole whose
# focal is shrunk just enough to contain every distorted pixel's ray, then
# (2) one spatially-coherent gather that resamples the pinhole index/depth
# images at each distorted pixel's undistorted ray — the on-device analogue
# of COLMAP's image undistortion step that the reference requires users to
# run externally (its Camera union is pinhole-only,
# ref: include/semantic_meshes/render/Camera.h:9-12). Gathers from rendered
# index images ride the fast coherent-gather path (~2 ms/view), and the whole
# plan + render + resample compiles to ONE program per view.


def _has_distortion(cameras):
    """Host-side check (cameras carry concrete numpy distortion params)."""
    for c in cameras:
        d = getattr(c, "distortion", None)
        if d is not None and np.any(np.asarray(d)):
            return True
    return False


def _undistort_grid(fl, pp, dist, *, height, width):
    """Undistorted normalized coords of every distorted pixel center
    ((H, W, 2)) and the virtual-pinhole focal scale s <= 1 keeping
    fl*s*n + pp strictly inside the (height, width) pinhole image."""
    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    nd = jnp.stack(
        [(xx - pp[0]) / fl[0], (yy - pp[1]) / fl[1]], axis=-1
    )
    n = geometry.undistort_normalized(nd, dist)
    r_d = jnp.sqrt(nd[..., 0] ** 2 + nd[..., 1] ** 2)
    r_n = jnp.sqrt(n[..., 0] ** 2 + n[..., 1] ** 2)
    valid = None
    if dist.shape[-1] == geometry.LENS_EXTENDED_DIM:
        # EXACT per-pixel clamp for the extended wire: the classic 3x-
        # corner heuristic below assumes undistorted ~ distorted radius,
        # which the fisheye/FOV families violate badly (an equidistant
        # fisheye's corner ray is tan(theta) ~ 9.2 at a 170-deg diagonal
        # vs 3 * r_d ~ 4.4 — the heuristic silently clamped periphery
        # rays onto interior pixels). Invert the sampled monotone radial
        # response per pixel instead: each pixel's radius is capped at
        # the response's inverse of its own r_d (one sample up, so
        # quantization never under-caps), which is a no-op for converged
        # Newton pixels and exact for diverged ones. Pixels whose r_d
        # exceeds the lens's producible response (beyond the model's
        # image circle — normal at the corners of wide fisheye frames)
        # have NO ray: they are excluded from the focal-scale min below
        # and land outside the virtual frame, where the resample clips
        # to the border (background in practice).
        rr, rd_s, good = geometry._radial_response(dist)
        rd_sorted = jnp.where(good, rd_s, jnp.inf)
        rd_prod_max = jnp.max(jnp.where(good, rd_s, -jnp.inf)) * 0.999
        valid = r_d <= rd_prod_max
        i = jnp.searchsorted(rd_sorted, jnp.minimum(r_d, rd_prod_max))
        r_cap_pix = jnp.take(rr, jnp.minimum(i, rr.shape[0] - 1))
        n = n * jnp.minimum(
            1.0, r_cap_pix / jnp.maximum(r_n, 1e-20)
        )[..., None]
    else:
        # Classic-wire robustness clamp: outside the lens's invertible
        # domain (barrel distortion past the fold radius, where the
        # radial polynomial's derivative crosses zero) Newton can wander;
        # bound the undistorted radius to the closed-form monotonic range
        # — the largest radius the lens can actually have produced — with
        # 3x the largest distorted corner radius as a fallback for lenses
        # that are monotonic everywhere (there the undistorted radius is
        # finite anyway, and comparable to r_d for the radial family).
        # The virtual focal scale below takes a min over EVERY pixel, so
        # without this one diverged corner would undersample the whole
        # frame (ADVICE r4).
        r_cap = jnp.minimum(
            geometry.max_monotonic_radius(dist), 3.0 * jnp.max(r_d)
        )
        n = n * jnp.minimum(1.0, r_cap / jnp.maximum(r_n, 1e-20))[..., None]

    def axis_scale(nv, f, c, size):
        # largest s with 0.5 <= s*f*nv + c <= size - 0.5 for every pixel
        # (no-ray pixels masked to nv = 0 contribute inf, i.e. nothing)
        if valid is not None:
            nv = jnp.where(valid, nv, 0.0)
        s = jnp.where(
            nv > 0,
            (size - 0.5 - c) / (f * nv),
            jnp.where(nv < 0, (0.5 - c) / (f * nv), jnp.inf),
        )
        return jnp.min(s)

    s = jnp.minimum(
        jnp.float32(1.0),
        jnp.minimum(
            axis_scale(n[..., 0], fl[0], pp[0], jnp.float32(width)),
            axis_scale(n[..., 1], fl[1], pp[1], jnp.float32(height)),
        ),
    )
    # Zero-lens cameras (pinhole views mixed into a distorted batch, and
    # the contract that the distorted path with k = 0 reproduces the
    # pinhole render BIT-identically) must not depend on float identities:
    # TPU f32 division is not correctly rounded, so Newton returns nd +-
    # 1 ulp and the divide-multiply round trip in axis_scale yields
    # s = 1 - 2 ulp (measured on v5e — the virtual render then rasterizes
    # under a focal one ulp off and edge pixels flip). Select the exact
    # identity grid structurally instead.
    is_zero = jnp.all(dist == 0.0)
    n = jnp.where(is_zero, nd, n)
    s = jnp.where(is_zero, jnp.float32(1.0), s)
    return n, s


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _distortion_scales(fl, pp, dist, *, height, width):
    """(N,) virtual-pinhole focal scales for a camera batch (vmapped
    _undistort_grid, keeping only s) — used so budget probes match the
    focal the distorted render rasterizes with."""
    def one(f, p, d):
        _, s = _undistort_grid(f, p, d, height=height, width=width)
        return s

    return jax.vmap(one)(fl, pp, dist)


def _resample_wh(idx_wh, depth_wh, n, fl_s, pp):
    """Nearest-sample the (W, H) pinhole index/depth images at the pinhole
    pixel coords of each distorted pixel's ray; returns (W, H) outputs.

    The sample is ONE packed 2-lane row gather instead of two 2D
    advanced-index gathers — measured 3.1x faster on v5e at 1024x768
    (7.5 vs 23.4 ms/view standalone; the resample dominated the
    distorted path's cost, docs/PERFORMANCE.md "Distorted-camera
    overhead").

    The packing is in UINT32 space (depth bits bitcast beside the raw
    index), not float space: TPU f32 gathers in this fused 2-lane form
    canonicalize NaNs (0xFFFFFFFF background -> 0x7FC00000) and flush
    denormals to zero (EVERY primitive index < 0x00800000 -> 0) —
    measured on v5e, /tmp bitcast probes, round 5. Integer lanes are
    inert through any data movement, so the uint32 form is bit-exact at
    identical speed (5.85 vs 5.89 ms standalone at 786k rows). Same
    hazard class the rasterizers avoid via _ID_BIAS (dense.py:523)."""
    px = fl_s[0] * n[..., 0] + pp[0]  # (H, W)
    py = fl_s[1] * n[..., 1] + pp[1]
    w_img, h_img = idx_wh.shape
    ix = jnp.clip(px.astype(jnp.int32), 0, w_img - 1)
    iy = jnp.clip(py.astype(jnp.int32), 0, h_img - 1)
    packed = jnp.stack(
        [idx_wh, jax.lax.bitcast_convert_type(depth_wh, jnp.uint32)],
        axis=-1,
    ).reshape(-1, 2)
    lin = (ix * h_img + iy).reshape(-1)
    out = packed[lin].reshape(ix.shape + (2,))
    dep = jax.lax.bitcast_convert_type(out[..., 1], jnp.float32)
    return out[..., 0].T, dep.T


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "backend",
                     "clip_near", "dense_e_cap"),
)
def _render_triangles_distorted_jit(vertices, faces, face_vertices, rot,
                                    trans, fl, pp, dist, *, height, width,
                                    max_tris_per_tile, backend,
                                    clip_near=False, dense_e_cap=None):
    """Distorted-camera triangle render: virtual-pinhole render + undistort
    resample, one compiled program."""
    n, s = _undistort_grid(fl, pp, dist, height=height, width=width)
    fl_s = fl * s
    idx_wh, depth_wh, overflow = _render_triangles_jit(
        vertices, faces, face_vertices, rot, trans, fl_s, pp,
        height=height, width=width, max_tris_per_tile=max_tris_per_tile,
        backend=backend, clip_near=clip_near, dense_e_cap=dense_e_cap,
    )
    idx, depth = _resample_wh(idx_wh, depth_wh, n, fl_s, pp)
    return idx, depth, overflow


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "backend",
                     "num_primitives", "clip_near", "dense_e_cap"),
)
def _render_texels_distorted_jit(vertices, faces, face_vertices, resolutions,
                                 first_texel_index, rot, trans, fl, pp, dist,
                                 *, height, width, max_tris_per_tile, backend,
                                 num_primitives, clip_near=False,
                                 dense_e_cap=None):
    n, s = _undistort_grid(fl, pp, dist, height=height, width=width)
    fl_s = fl * s
    idx_wh, depth_wh, overflow = _render_texels_jit(
        vertices, faces, face_vertices, resolutions, first_texel_index,
        rot, trans, fl_s, pp, height=height, width=width,
        max_tris_per_tile=max_tris_per_tile, backend=backend,
        num_primitives=num_primitives, clip_near=clip_near,
        dense_e_cap=dense_e_cap,
    )
    idx, depth = _resample_wh(idx_wh, depth_wh, n, fl_s, pp)
    return idx, depth, overflow


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "backend",
                     "clip_near", "dense_e_cap"),
)
def _render_scan_distorted(vertices, faces, face_vertices, rot, trans, fl,
                           pp, dist, *, height, width, max_tris_per_tile,
                           backend=None, clip_near=False, dense_e_cap=None):
    """Batched distorted render; returns (idx (N, W, H) u32, depth (N, W, H),
    overflow) — note the per-view outputs are already (W, H), unlike
    _render_scan whose consumers transpose."""
    def step(ov, cam):
        r, t, f, p, d = cam
        idx, depth, ov_i = _render_triangles_distorted_jit(
            vertices, faces, face_vertices, r, t, f, p, d,
            height=height, width=width,
            max_tris_per_tile=max_tris_per_tile, backend=backend,
            clip_near=clip_near, dense_e_cap=dense_e_cap,
        )
        return ov + ov_i, (idx, depth)

    ov, (idxs, depths) = jax.lax.scan(
        step, jnp.int32(0), (rot, trans, fl, pp, dist)
    )
    return idxs, depths, ov


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile",
                     "num_primitives", "backend", "clip_near",
                     "dense_e_cap"),
)
def _render_texels_scan_distorted(vertices, faces, face_vertices,
                                  resolutions, first_texel_index, rot, trans,
                                  fl, pp, dist, *, height, width,
                                  max_tris_per_tile, num_primitives,
                                  backend=None, clip_near=False,
                                  dense_e_cap=None):
    def step(ov, cam):
        r, t, f, p, d = cam
        idx, depth, ov_i = _render_texels_distorted_jit(
            vertices, faces, face_vertices, resolutions, first_texel_index,
            r, t, f, p, d, height=height, width=width,
            max_tris_per_tile=max_tris_per_tile, backend=backend,
            num_primitives=num_primitives, clip_near=clip_near,
            dense_e_cap=dense_e_cap,
        )
        return ov + ov_i, (idx, depth)

    ov, (idxs, depths) = jax.lax.scan(
        step, jnp.int32(0), (rot, trans, fl, pp, dist)
    )
    return idxs, depths, ov


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "backend",
                     "clip_near", "dense_e_cap"),
)
def _render_triangles_jit(vertices, faces, face_vertices, rot, trans, fl,
                          pp, *, height, width, max_tris_per_tile, backend,
                          clip_near=False, dense_e_cap=None):
    """Whole triangle-mode render in ONE compiled program (rasterize +
    uint32 cast + (W, H) transpose): a single dispatch per frame instead of
    several, which matters when dispatch rides a tunneled transport."""
    tri, depth, overflow = rast.rasterize(
        vertices, faces, rot, trans, fl, pp,
        face_vertices=face_vertices, backend=backend,
        height=height, width=width, max_tris_per_tile=max_tris_per_tile,
        clip_near=clip_near, dense_e_cap=dense_e_cap,
    )
    return tri.astype(jnp.uint32).T, depth.T, overflow


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "backend",
                     "num_primitives", "clip_near", "dense_e_cap"),
)
def _render_texels_jit(vertices, faces, face_vertices, resolutions,
                       first_texel_index, rot, trans, fl, pp, *, height,
                       width, max_tris_per_tile, backend, num_primitives,
                       clip_near=False, dense_e_cap=None):
    """Texel-mode render (rasterize + barycentric texel shader + transpose)
    as one compiled program."""
    tri, depth, overflow = rast.rasterize(
        vertices, faces, rot, trans, fl, pp,
        face_vertices=face_vertices, backend=backend,
        height=height, width=width, max_tris_per_tile=max_tris_per_tile,
        clip_near=clip_near, dense_e_cap=dense_e_cap,
    )
    indices = _texel_indices(
        vertices, faces, rot, trans, fl, pp, tri, resolutions,
        first_texel_index, num_primitives, clip_near=clip_near,
    )
    return indices.T, depth.T, overflow


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile",
                     "num_primitives", "backend", "clip_near",
                     "dense_e_cap"),
)
def _render_texels_scan(vertices, faces, face_vertices, resolutions,
                        first_texel_index, rot, trans, fl, pp, *, height,
                        width, max_tris_per_tile, num_primitives,
                        backend=None, clip_near=False, dense_e_cap=None):
    def step(ov, cam):
        r, t, f, p = cam
        idx, depth, ov_i = _render_texels_jit(
            vertices, faces, face_vertices, resolutions, first_texel_index,
            r, t, f, p, height=height, width=width,
            max_tris_per_tile=max_tris_per_tile, backend=backend,
            num_primitives=num_primitives, clip_near=clip_near,
            dense_e_cap=dense_e_cap,
        )
        return ov + ov_i, (idx, depth)

    ov, (idxs, depths) = jax.lax.scan(
        step, jnp.int32(0), (rot, trans, fl, pp)
    )
    return idxs, depths, ov


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "max_tris_per_tile", "backend",
                     "clip_near", "dense_e_cap"),
)
def _render_scan(vertices, faces, face_vertices, rot, trans, fl, pp, *,
                 height, width, max_tris_per_tile, backend=None,
                 clip_near=False, dense_e_cap=None):
    def step(ov, cam):
        r, t, f, p = cam
        tri, depth, ov_i = rast.rasterize(
            vertices, faces, r, t, f, p, face_vertices=face_vertices,
            backend=backend, clip_near=clip_near, dense_e_cap=dense_e_cap,
            height=height, width=width, max_tris_per_tile=max_tris_per_tile,
        )
        return ov + ov_i, (tri, depth)

    ov, (tris, depths) = jax.lax.scan(
        step, jnp.int32(0), (rot, trans, fl, pp)
    )
    return tris, depths, ov


def triangles(mesh: Ply, **kwargs) -> TrianglesRenderer:
    """Factory matching `semantic_meshes.render.triangles(mesh)`
    (ref: python/semantic_meshes/src/Render.cu:24)."""
    return TrianglesRenderer(mesh, **kwargs)


def texels(mesh: Ply, cameras, texels_per_pixel: float = 0.1,
           **kwargs) -> TexelsRenderer:
    """Factory matching `semantic_meshes.render.texels(mesh, colmap|[cameras]
    [, texels_per_pixel])` (ref: python/semantic_meshes/src/Render.cu:20-23)."""
    return TexelsRenderer(mesh, cameras, texels_per_pixel, **kwargs)


# Reference-compatible class aliases (ref: Render.cu:16-17)
PlyRendererTriangles = TrianglesRenderer
PlyRendererTexels = TexelsRenderer
