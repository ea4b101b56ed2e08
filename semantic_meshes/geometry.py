"""Pure-JAX geometry kernels: projections, rigid transforms, barycentrics, texels.

TPU-native rebuild of the geometry facilities the reference pulls from the
template-tensors metalibrary:

- pinhole projection       (ref: include/semantic_meshes/render/Camera.h:7-15,
                            tt::geometry::projection::PinholeFC)
- rigid world->camera      (ref: tt::geometry::transform::Rigid<float,3>)
- quaternion -> rotation   (ref: tt::colmap image metadata parsing)
- barycentric coordinates + perspective-correct interpolation for the
  rasterizer (ref: tt::geometry::render::DeviceMutexRasterizer intersect)
- triangular texel grid indexing
                           (ref: include/semantic_meshes/render/
                            TexturedTriangleRenderer.h:31-47,
                            tt::SymmetricMatrixLowerTriangleRowMajor)

Everything here is shape-polymorphic pure jnp, vmap/jit friendly, and runs on
TPU without host round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# Rotations / rigid transforms
# --------------------------------------------------------------------------


def quaternion_to_rotation(q):
    """COLMAP-convention (w, x, y, z) unit quaternion(s) -> rotation matrix.

    q: (..., 4) -> (..., 3, 3). Pure jnp; works batched.
    """
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - w * z),
            2 * (x * z + w * y),
            2 * (x * y + w * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - w * x),
            2 * (x * z - w * y),
            2 * (y * z + w * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rigid_transform(rotation, translation, points):
    """Apply p_cam = R @ p_world + t.

    rotation: (..., 3, 3), translation: (..., 3), points: (..., N, 3) or (..., 3).
    Matches tt::geometry::transform::Rigid<float,3>::transformPoint
    (ref: include/semantic_meshes/render/TexturedTriangleRenderer.h:107).
    """
    points = jnp.asarray(points)
    single = points.ndim == translation.ndim
    pts = points if not single else points[..., None, :]
    # full-f32 precision: geometry feeds the rasterizer, where bf16-class
    # matmul error (the TPU default) would shift pixel coordinates
    out = (
        jnp.einsum(
            "...ij,...nj->...ni",
            rotation,
            pts,
            precision=jax.lax.Precision.HIGHEST,
        )
        + translation[..., None, :]
    )
    return out[..., 0, :] if single else out


def pinhole_project(focal_lengths, principal_point, points_cam):
    """Pinhole projection: pixel = f * (x/z, y/z) + c.

    focal_lengths: (..., 2), principal_point: (..., 2), points_cam: (..., N, 3).
    Returns (..., N, 2) pixel coordinates (x, y).
    Matches tt::geometry::projection::PinholeFC::project
    (ref: include/semantic_meshes/render/Camera.h:10-11).
    Division by z==0 yields inf; callers mask on z > 0.
    """
    xy = points_cam[..., :2]
    z = points_cam[..., 2:3]
    return focal_lengths[..., None, :] * (xy / z) + principal_point[..., None, :]


# --------------------------------------------------------------------------
# Lens distortion (COLMAP SIMPLE_RADIAL / RADIAL / OPENCV family, plus the
# extended FULL_OPENCV / fisheye / FOV wire)
# --------------------------------------------------------------------------
#
# The reference's Camera union covers only SIMPLE_PINHOLE and PINHOLE
# (ref: include/semantic_meshes/render/Camera.h:9-12) and tells users to
# undistort the workspace externally; COLMAP's *default* model is
# SIMPLE_RADIAL, so real workspaces need this. Canonical parameter vector is
# (k1, k2, p1, p2) on normalized camera coordinates — the OPENCV model's
# distortion — with SIMPLE_RADIAL = (k1, 0, 0, 0) and RADIAL = (k1, k2, 0, 0),
# matching COLMAP's camera_models.h Distortion() definitions.
#
# EXTENDED WIRE (..., 9): 8 parameter slots + a model-selector column, so a
# single traced array carries every COLMAP lens family through the same
# jitted pipelines (per-view selection is a branchless jnp.where — the three
# candidate maps are a few elementwise ops each, negligible next to the
# render). The classic (..., 4) wire keeps its dedicated code path so
# existing programs stay bit-identical. Slot meaning by selector:
#
#   LENS_RADTAN (0): (k1, k2, p1, p2, k3, k4, k5, k6) — rational radial
#       (1 + k1 r2 + k2 r4 + k3 r6) / (1 + k4 r2 + k5 r4 + k6 r6) plus the
#       OpenCV tangential terms (FULL_OPENCV; k3..k6 = 0 gives OPENCV, so a
#       zero-padded classic vector means the same model).
#   LENS_FISHEYE (1): (k1, k2, k3, k4, 0, 0, 0, 0) — equidistant fisheye,
#       theta_d = theta (1 + k1 th2 + k2 th4 + k3 th6 + k4 th8) with
#       theta = atan(r) (OPENCV_FISHEYE; SIMPLE_RADIAL_FISHEYE /
#       RADIAL_FISHEYE truncate the polynomial). NOTE zero ks is NOT the
#       identity — equidistant projection itself bends rays.
#   LENS_FOV (2): (omega, 0, ...) — Devernay-Faugeras FOV model,
#       r_d = atan(2 r tan(omega/2)) / omega.
#   LENS_THIN_PRISM (3): (k1, k2, p1, p2, k3, k4, sx1, sy1) — COLMAP's
#       THIN_PRISM_FISHEYE: equidistant projection (u, v) -> atan(r)/r *
#       (u, v) first, then a 4-term radial polynomial + OpenCV tangential
#       + thin-prism (sx1 r2, sy1 r2) terms on the projected coords.
#       Zero params is NOT the identity (the equidistant step bends rays,
#       like LENS_FISHEYE).

LENS_RADTAN = 0.0
LENS_FISHEYE = 1.0
LENS_FOV = 2.0
LENS_THIN_PRISM = 3.0
LENS_EXTENDED_DIM = 9


def _distort_extended(xy, dist):
    """Forward distortion for the extended (..., 9) lens wire."""
    xy = jnp.asarray(xy)
    dist = jnp.asarray(dist)
    x, y = xy[..., 0], xy[..., 1]
    s = [dist[..., i] for i in range(8)]
    sel = dist[..., 8]
    x2, y2, xyp = x * x, y * y, x * y
    r2 = x2 + y2

    # radial-tangential, rational polynomial (FULL_OPENCV)
    k1, k2, p1, p2, k3, k4, k5, k6 = s
    num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
    rad = num / jnp.where(den == 0.0, 1.0, den)
    xt = x * rad + 2.0 * p1 * xyp + p2 * (r2 + 2.0 * x2)
    yt = y * rad + p1 * (r2 + 2.0 * y2) + 2.0 * p2 * xyp

    # equidistant fisheye (OPENCV_FISHEYE family): slots 0..3 are k1..k4
    fk1, fk2, fk3, fk4 = s[0], s[1], s[2], s[3]
    r = jnp.sqrt(r2)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (
        1.0 + t2 * (fk1 + t2 * (fk2 + t2 * (fk3 + t2 * fk4)))
    )
    safe_r = jnp.maximum(r, 1e-8)
    # r -> 0: theta ~ r and t2 -> 0, so the scale limit is exactly 1
    fish = jnp.where(r < 1e-8, 1.0, theta_d / safe_r)

    # FOV model: slot 0 is omega
    w = s[0]
    tw = jnp.tan(0.5 * w)
    safe_w = jnp.where(jnp.abs(w) < 1e-6, 1.0, w)
    fov_gen = jnp.arctan(2.0 * safe_r * tw) / (safe_r * safe_w)
    fov = jnp.where(r < 1e-8, 2.0 * tw / safe_w, fov_gen)
    fov = jnp.where(jnp.abs(w) < 1e-6, 1.0, fov)

    # thin-prism fisheye (THIN_PRISM_FISHEYE): equidistant projection,
    # then radial (slots 0, 1, 4, 5) + tangential (2, 3) + thin prism
    # (6, 7) on the projected coords — COLMAP camera_models.h order
    # (k1, k2, p1, p2, k3, k4, sx1, sy1)
    eq = jnp.where(r < 1e-8, 1.0, theta / safe_r)
    uu, vv = x * eq, y * eq
    u2, v2, uv = uu * uu, vv * vv, uu * vv
    q2 = u2 + v2
    tk1, tk2, tp1, tp2 = s[0], s[1], s[2], s[3]
    tk3, tk4, sx1, sy1 = s[4], s[5], s[6], s[7]
    t_rad = q2 * (tk1 + q2 * (tk2 + q2 * (tk3 + q2 * tk4)))
    du = uu * t_rad + 2.0 * tp1 * uv + tp2 * (q2 + 2.0 * u2) + sx1 * q2
    dv = vv * t_rad + tp1 * (q2 + 2.0 * v2) + 2.0 * tp2 * uv + sy1 * q2
    out_tpf = jnp.stack([uu + du, vv + dv], axis=-1)

    scale = jnp.where(sel == LENS_FISHEYE, fish,
                      jnp.where(sel == LENS_FOV, fov, 1.0))
    out_scaled = xy * scale[..., None]
    out_radtan = jnp.stack([xt, yt], axis=-1)
    return jnp.where(
        (sel == LENS_RADTAN)[..., None], out_radtan,
        jnp.where((sel == LENS_THIN_PRISM)[..., None], out_tpf, out_scaled),
    )


def _undistort_extended(xy_distorted, dist, iters: int = 30):
    """Newton inversion of _distort_extended.

    The 2x2 Jacobian columns come from two jax.jvp evaluations of the
    forward map — exact for every lens family without per-model analytic
    derivatives, and still straight-line code under jit. Iterates are
    clamped to a generous ball so a pixel outside the invertible domain
    (render._undistort_grid clamps those afterwards) cannot drag the
    fori_loop through inf/nan."""
    xy_distorted = jnp.asarray(xy_distorted, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)

    def fwd(xy):
        return _distort_extended(xy, dist)

    ex = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0], jnp.float32), xy_distorted.shape
    )
    ey = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0], jnp.float32), xy_distorted.shape
    )

    def step(_, xy):
        fxy, jx = jax.jvp(fwd, (xy,), (ex,))
        _, jy = jax.jvp(fwd, (xy,), (ey,))
        a, c = jx[..., 0], jx[..., 1]
        b, d = jy[..., 0], jy[..., 1]
        rx = fxy[..., 0] - xy_distorted[..., 0]
        ry = fxy[..., 1] - xy_distorted[..., 1]
        det = a * d - b * c
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        nx = xy[..., 0] - (d * rx - b * ry) * inv_det
        ny = xy[..., 1] - (a * ry - c * rx) * inv_det
        new = jnp.stack([nx, ny], axis=-1)
        nrm = jnp.sqrt(jnp.sum(new * new, axis=-1, keepdims=True))
        return new * jnp.minimum(1.0, 100.0 / jnp.maximum(nrm, 1e-8))

    return jax.lax.fori_loop(0, iters, step, xy_distorted)


def distort_normalized(xy, dist):
    """Forward lens distortion on normalized camera coords (x/z, y/z).

    xy: (..., 2); dist: (..., 4) = (k1, k2, p1, p2) or the extended
    (..., 9) wire (see the LENS_* module comment), broadcastable against
    xy's batch shape. The classic 4-wide path is kept verbatim (existing
    programs stay bit-identical). Returns distorted normalized coords
    (..., 2); for the 4-wide wire:

        r2 = x^2 + y^2;  radial = k1 r2 + k2 r2^2
        x' = x (1 + radial) + 2 p1 x y + p2 (r2 + 2 x^2)
        y' = y (1 + radial) + p1 (r2 + 2 y^2) + 2 p2 x y
    """
    xy = jnp.asarray(xy)
    dist = jnp.asarray(dist)
    if dist.shape[-1] == LENS_EXTENDED_DIM:
        return _distort_extended(xy, dist)
    x, y = xy[..., 0], xy[..., 1]
    k1, k2, p1, p2 = (dist[..., i] for i in range(4))
    x2, y2, xyp = x * x, y * y, x * y
    r2 = x2 + y2
    radial = k1 * r2 + k2 * r2 * r2
    dx = x * radial + 2.0 * p1 * xyp + p2 * (r2 + 2.0 * x2)
    dy = y * radial + p1 * (r2 + 2.0 * y2) + 2.0 * p2 * xyp
    return xy + jnp.stack([dx, dy], axis=-1)


def undistort_normalized(xy_distorted, dist, iters: int = 20):
    """Invert distort_normalized by Newton iteration on the 2x2 Jacobian.

    The TPU-shaped equivalent of COLMAP's IterativeUndistortion (Newton on
    the residual, fixed iteration count so it jits to straight-line code;
    20 iterations converge to f32 roundoff for any physically plausible
    k1/k2/p1/p2). Elementwise over (..., 2) points, vmap/grid friendly.
    The extended (..., 9) wire routes to the jvp-Jacobian Newton
    (_undistort_extended); the classic path below is kept verbatim.
    """
    xy_distorted = jnp.asarray(xy_distorted, jnp.float32)
    dist = jnp.asarray(dist, jnp.float32)
    if dist.shape[-1] == LENS_EXTENDED_DIM:
        return _undistort_extended(xy_distorted, dist, iters=max(iters, 30))
    k1, k2, p1, p2 = (dist[..., i] for i in range(4))

    def step(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        x2, y2, xyp = x * x, y * y, x * y
        r2 = x2 + y2
        radial = k1 * r2 + k2 * r2 * r2
        dradial = 2.0 * k1 + 4.0 * k2 * r2  # d(radial)/d(r2) * 2
        fx = x * (1.0 + radial) + 2.0 * p1 * xyp + p2 * (r2 + 2.0 * x2) \
            - xy_distorted[..., 0]
        fy = y * (1.0 + radial) + p1 * (r2 + 2.0 * y2) + 2.0 * p2 * xyp \
            - xy_distorted[..., 1]
        jxx = 1.0 + radial + x2 * dradial + 2.0 * p1 * y + 6.0 * p2 * x
        jxy = xyp * dradial + 2.0 * p1 * x + 2.0 * p2 * y
        jyy = 1.0 + radial + y2 * dradial + 6.0 * p1 * y + 2.0 * p2 * x
        det = jxx * jyy - jxy * jxy
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        nx = x - (jyy * fx - jxy * fy) * inv_det
        ny = y - (jxx * fy - jxy * fx) * inv_det
        return jnp.stack([nx, ny], axis=-1)

    return jax.lax.fori_loop(0, iters, step, xy_distorted)


def max_monotonic_radius(dist):
    """Largest undistorted radius within the radial model's invertible
    (monotonic) range, or +inf when the polynomial is monotonic
    everywhere.

    The radial map r -> r (1 + k1 r^2 + k2 r^4) folds where its
    derivative 1 + 3 k1 r^2 + 5 k2 r^4 hits zero; beyond the fold the
    lens is not invertible and Newton (undistort_normalized) can wander
    arbitrarily far. Solving for x = r^2: 5 k2 x^2 + 3 k1 x + 1 = 0 —
    the smallest positive root is the fold. Tangential p1/p2 terms are
    ignored for this bound (they do not affect the radial fold and are
    small for real lenses). Branchless over a traced (..., 4) dist; used
    by render._undistort_grid to cap diverged pixels (ADVICE r4: one bad
    corner must not shrink the virtual focal for the whole frame).

    The extended (..., 9) wire uses a numeric monotone-prefix scan of the
    forward radial response instead (works for every lens family)."""
    dist = jnp.asarray(dist, jnp.float32)
    if dist.shape[-1] == LENS_EXTENDED_DIM:
        return _max_monotonic_radius_extended(dist)
    k1, k2 = dist[..., 0], dist[..., 1]
    disc = 9.0 * k1 * k1 - 20.0 * k2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    quad_ok = (k2 != 0) & (disc >= 0)
    denom_q = jnp.where(k2 == 0, 1.0, 10.0 * k2)
    lin_ok = (k2 == 0) & (k1 < 0)
    denom_l = jnp.where(k1 == 0, 1.0, 3.0 * k1)

    def pos_or_inf(x, ok):
        return jnp.where(ok & (x > 0), x, jnp.inf)

    x_min = jnp.minimum(
        jnp.minimum(
            pos_or_inf((-3.0 * k1 - sq) / denom_q, quad_ok),
            pos_or_inf((-3.0 * k1 + sq) / denom_q, quad_ok),
        ),
        pos_or_inf(-1.0 / denom_l, lin_ok),
    )
    return jnp.sqrt(x_min)


def _radial_only_wire(dist):
    """Zero an extended wire's non-radial terms for the radial-response
    bound: tangential p1/p2 live in slots 2, 3 for the radtan AND
    thin-prism families (for fisheye those slots hold k3/k4 and are
    kept), and the thin-prism sx1/sy1 (slots 6, 7) shift even on-axis
    samples, so they are zeroed too."""
    dist = jnp.asarray(dist, jnp.float32)
    sel = dist[..., 8]
    tang = ((sel == LENS_RADTAN) | (sel == LENS_THIN_PRISM))[..., None]
    prism = (sel == LENS_THIN_PRISM)[..., None]
    return jnp.concatenate(
        [
            dist[..., :2],
            jnp.where(tang, 0.0, dist[..., 2:4]),
            dist[..., 4:6],
            jnp.where(prism, 0.0, dist[..., 6:8]),
            dist[..., 8:],
        ],
        axis=-1,
    )


def _radial_response(dist, samples: int = 512):
    """Sampled forward radial response of an extended-wire lens.

    Returns (r, rd, good): undistorted radii r = tan(theta) on a uniform
    theta grid (virtual rays out to ~88.8 deg), the distorted radius
    rd(r) each maps to (tangential/thin-prism terms zeroed — the radial
    bound, matching the classic path), and the strictly-increasing
    (invertible) prefix mask. Shared by the numeric fold radius and
    render._undistort_grid's per-pixel inverse. dist: (9,) single lens
    (no leading batch dims)."""
    d2 = _radial_only_wire(dist)
    theta = jnp.linspace(1e-3, 1.55, samples)
    r = jnp.tan(theta)
    pts = jnp.stack([r, jnp.zeros_like(r)], axis=-1)
    rd = _distort_extended(pts, d2[..., None, :])[..., 0]
    inc = (rd[..., 1:] > rd[..., :-1]).astype(jnp.float32)
    good = jnp.concatenate(
        [jnp.ones_like(inc[..., :1]), jnp.cumprod(inc, axis=-1)], axis=-1
    ) > 0
    return r, rd, good


def _max_monotonic_radius_extended(dist, samples: int = 512):
    """Numeric monotone-prefix fold radius for the extended (..., 9) wire.

    Samples the forward radial response r_d(r) on the x-axis at
    r = tan(theta), theta uniform up to ~88.8 deg (undistorted radii past
    that are outside any real camera's field of view), and returns the
    largest sampled radius whose prefix is strictly increasing — or +inf
    when the response is monotone over the whole probed range.
    Tangential/thin-prism terms are zeroed (_radial_only_wire) to match
    the classic path's radial-only bound. Branchless and vmappable over
    leading dist dims."""
    d2 = _radial_only_wire(dist)
    theta = jnp.linspace(1e-3, 1.55, samples)
    r = jnp.tan(theta)
    pts = jnp.stack([r, jnp.zeros_like(r)], axis=-1)  # (samples, 2)
    rd = _distort_extended(pts, d2[..., None, :])[..., 0]
    inc = (rd[..., 1:] > rd[..., :-1]).astype(jnp.float32)
    good = jnp.cumprod(inc, axis=-1)  # 1 while the prefix is monotone
    count = jnp.sum(good, axis=-1).astype(jnp.int32)
    r_last_good = jnp.take(r, count)
    return jnp.where(count == samples - 1, jnp.inf, r_last_good)


def look_at(eye, target, up):
    """Right-handed look-at -> (rotation, translation) world->camera, with the
    camera looking down +z (the projection convention used by the renderer).

    Utility for tests and the texel debug harness
    (ref: python/scripts/debug_render_texels.py:46-63 builds the same thing
    from pyrr matrices).
    """
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    # rows: camera axes expressed in world coords (x=right, y=down, z=forward)
    rotation = np.stack([right, down, fwd], axis=0)
    translation = -rotation @ eye
    return rotation.astype(np.float32), translation.astype(np.float32)


# --------------------------------------------------------------------------
# Triangles / barycentrics
# --------------------------------------------------------------------------


def signed_area2(a, b, c):
    """Twice the signed area of screen-space triangle (a, b, c); (..., 2) inputs."""
    return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])


def triangle_screen_area(projected):
    """Absolute screen-space area of projected triangles.

    projected: (..., 3, 2). Same formula as the texel-resolution precompute
    (ref: include/semantic_meshes/render/TexturedTriangleRenderer.h:121-123).
    """
    p0, p1, p2 = projected[..., 0, :], projected[..., 1, :], projected[..., 2, :]
    return 0.5 * jnp.abs(
        p0[..., 0] * (p1[..., 1] - p2[..., 1])
        + p1[..., 0] * (p2[..., 1] - p0[..., 1])
        + p2[..., 0] * (p0[..., 1] - p1[..., 1])
    )


def barycentric_2d(p, a, b, c):
    """Screen-space barycentric coordinates of points p wrt triangle (a, b, c).

    All inputs (..., 2); returns (..., 3) with components summing to 1.
    Degenerate triangles give nan (callers mask them out).
    """
    denom = signed_area2(a, b, c)
    w0 = signed_area2(b, c, p)
    w1 = signed_area2(c, a, p)
    w2 = signed_area2(a, b, p)
    return jnp.stack([w0, w1, w2], axis=-1) / denom[..., None]


def perspective_correct(bary2d, z_cam):
    """Convert screen-space barycentrics to perspective-correct (3D) ones.

    bary2d: (..., 3) screen-space weights; z_cam: (..., 3) camera-space depths
    of the triangle vertices. Returns (bary3d (..., 3), depth (...,)) where
    depth is the camera-space z of the surface point seen through the pixel.
    """
    inv_z = bary2d / z_cam
    denom = jnp.sum(inv_z, axis=-1)
    depth = 1.0 / denom
    bary3d = inv_z * depth[..., None]
    return bary3d, depth


# --------------------------------------------------------------------------
# Texel grid (triangular, "lower triangle row major")
# --------------------------------------------------------------------------
# The texel mode subdivides the unit uv-triangle {u>=0, v>=0, u+v<=1} into an
# r x r grid of cells; only cells with iu+iv <= r-1 fall inside the triangle,
# giving r(r+1)/2 texels. Texels are indexed in diagonal bands of growing
# length (band k = iu+iv has k+1 texels), matching the count identity the
# reference debug harness inverts: count = s(s+1)/2
# (ref: python/scripts/debug_render_texels.py:71-73) and
# tt::SymmetricMatrixLowerTriangleRowMajor::getSize
# (ref: include/semantic_meshes/render/TexturedTriangleRenderer.h:43-47).


def texel_count(resolution):
    """Number of texels of a triangle with grid resolution r: r(r+1)/2."""
    r = jnp.asarray(resolution)
    return r * (r + 1) // 2


TEXEL_UV_EPS = 1e-6  # ref: TexturedTriangleRenderer.h:38 subtracts 1e-6 from uv


def texel_index_uv(u, v, resolution):
    """texel_index on raw uv parameter coordinates (u = bary1, v = bary2)."""
    r = jnp.asarray(resolution)
    rf = r.astype(jnp.float32)
    iu = jnp.clip(jnp.floor((u - TEXEL_UV_EPS) * rf).astype(jnp.int32), 0, r - 1)
    iv = jnp.clip(jnp.floor((v - TEXEL_UV_EPS) * rf).astype(jnp.int32), 0, r - 1)
    k = jnp.minimum(iu + iv, r - 1)
    iv = jnp.minimum(iv, k)
    return (k * (k + 1)) // 2 + iv


def texel_index(bary3d, resolution):
    """Map perspective-correct barycentrics to a texel index within a triangle.

    uv is the coordinate of the point in the triangle's parameter space with
    vertex0 -> (0,0), vertex1 -> (1,0), vertex2 -> (0,1)
    (ref: TexturedTriangleRenderer.h:34-37). The grid cell is
    floor((uv - 1e-6) * r); the linear index packs diagonal bands
    k = iu+iv row-major: index = k(k+1)/2 + iv.

    bary3d: (..., 3); resolution: (...,) int32. Returns (...,) int32 in
    [0, r(r+1)/2).
    """
    return texel_index_uv(bary3d[..., 1], bary3d[..., 2], resolution)


def clip_triangles_near(cam_verts, znear):
    """Clip camera-space triangles against the z = znear plane.

    cam_verts: (T, 3, 3). Each input triangle yields up to TWO output
    pieces (a triangle crossing the plane with 2 vertices in front clips to
    a quad). Returns (pieces (T, 2, 3, 3), valid (T, 2)): piece vertices are
    all at z >= znear where valid; the winding of each piece preserves the
    input's cyclic orientation.
    """
    z = cam_verts[..., 2]
    in_front = z > znear  # (T, 3)
    pattern = (
        in_front[:, 0].astype(jnp.int32)
        + 2 * in_front[:, 1].astype(jnp.int32)
        + 4 * in_front[:, 2].astype(jnp.int32)
    )
    # cyclic rotation per pattern so that the in-front vertices come first:
    # n_in==1 -> [A in front]; n_in==2 -> [A, B in front]
    perm_table = jnp.asarray(
        [
            [0, 1, 2],  # 0: none
            [0, 1, 2],  # 1: v0
            [1, 2, 0],  # 2: v1
            [0, 1, 2],  # 3: v0, v1
            [2, 0, 1],  # 4: v2
            [2, 0, 1],  # 5: v2, v0
            [1, 2, 0],  # 6: v1, v2
            [0, 1, 2],  # 7: all
        ],
        dtype=jnp.int32,
    )
    perm = perm_table[pattern]  # (T, 3)
    p = jnp.take_along_axis(cam_verts, perm[..., None], axis=1)  # (T, 3, 3)
    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    za, zb, zc = a[..., 2], b[..., 2], c[..., 2]

    def isect(p0, p1, z0, z1):
        t = (znear - z0) / jnp.where(z1 == z0, 1.0, z1 - z0)
        t = jnp.clip(t, 0.0, 1.0)[..., None]
        out = p0 + t * (p1 - p0)
        # pin z exactly to the plane (guards fp residue below znear)
        return out.at[..., 2].set(znear)

    ab = isect(a, b, za, zb)
    ac = isect(a, c, za, zc)
    bc = isect(b, c, zb, zc)

    n_in = jnp.sum(in_front, axis=-1)  # (T,)
    full = (n_in == 3)[:, None, None]
    one = (n_in == 1)[:, None, None]
    # piece 0: full triangle | (A, AB, AC) | (A, B, BC)
    p0 = jnp.where(
        full,
        p,
        jnp.where(
            one,
            jnp.stack([a, ab, ac], axis=1),
            jnp.stack([a, b, bc], axis=1),
        ),
    )
    # piece 1 (only for n_in == 2): (A, BC, AC)
    p1 = jnp.stack([a, bc, ac], axis=1)
    pieces = jnp.stack([p0, p1], axis=1)  # (T, 2, 3, 3)
    valid0 = n_in >= 1
    valid1 = n_in == 2
    return pieces, jnp.stack([valid0, valid1], axis=1)


@jax.jit
def reorder_faces_for_texels(vertices, faces):
    """Reorder each face so the most-right-angled vertex maps to uv (0, 0).

    Mirrors the reference ctor (TexturedTriangleRenderer.h:129-146):
      diffs[i] = |angle_at_vertex_i - 90deg|
      - swap face[0] <-> face[argmin(diffs)] (and the diffs entries)
      - if diffs[1] >= diffs[2]: swap face[1] <-> face[2]

    vertices: (V, 3) f32, faces: (T, 3) i32. Returns reordered faces (T, 3).
    Vectorized over triangles (the reference runs this as a host OpenMP
    loop). Jitted as ONE program: eagerly it dispatches ~30 separate op
    kernels, each a separate compile through a tunneled compile service
    (~4 minutes cold at 50k faces vs seconds for the fused program).
    """
    v = jnp.asarray(vertices)
    f = jnp.asarray(faces)
    p = v[f]  # (T, 3, 3)

    def angle_diff(i):
        a = p[:, i % 3]
        b = p[:, (i + 1) % 3]
        c = p[:, (i + 2) % 3]
        e1 = b - a
        e2 = c - a
        denom = jnp.linalg.norm(e1, axis=-1) * jnp.linalg.norm(e2, axis=-1)
        cosang = jnp.sum(e1 * e2, axis=-1) / jnp.maximum(denom, 1e-20)
        ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        # degenerate (zero-length edge) vertices never win the right-angle
        # contest instead of poisoning argmin with NaN
        return jnp.where(denom > 0, jnp.abs(ang - jnp.pi / 2), jnp.inf)

    diffs = jnp.stack([angle_diff(0), angle_diff(1), angle_diff(2)], axis=-1)  # (T,3)
    best = jnp.argmin(diffs, axis=-1)  # (T,)

    t = jnp.arange(f.shape[0])
    # swap position 0 with best (faces and diffs alike)
    idx0 = best
    f0 = f[t, idx0]
    f_rest = f.at[t, idx0].set(f[:, 0])
    f1 = jnp.where(idx0 == 1, f[:, 0], f_rest[:, 1])
    f2 = jnp.where(idx0 == 2, f[:, 0], f_rest[:, 2])
    d_rest = diffs.at[t, idx0].set(diffs[:, 0])
    d1 = jnp.where(idx0 == 1, diffs[:, 0], d_rest[:, 1])
    d2 = jnp.where(idx0 == 2, diffs[:, 0], d_rest[:, 2])
    # conditional swap of positions 1 and 2
    swap12 = d1 >= d2
    f1_final = jnp.where(swap12, f2, f1)
    f2_final = jnp.where(swap12, f1, f2)
    return jnp.stack([f0, f1_final, f2_final], axis=-1).astype(f.dtype)
