#!/usr/bin/env python3
"""Decision probe: in-pipeline marginal cost per micro fragment-sort row
at the dense preset. If removing ~1.2M rows saves ~7+ ms/view, the
static uni-slot split project pays; if ~3 ns/row or less, it dies."""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/sm_xla"))
import jax, jax.numpy as jnp, numpy as np
from semantic_meshes import testing
from semantic_meshes.data import stack_cameras
from semantic_meshes.rasterize import dense

SUB, W, H = 204, 1024, 768
NV = 4

def timed(fn, reps=8):
    out = fn(); np.asarray(out).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3

def main():
    v, f = testing.make_cube(subdivisions=SUB)
    cams = testing.make_ring_cameras(num_views=NV, width=W, height=H)
    rot, trans, fl, pp = jax.device_put(stack_cameras(cams))
    v, f = jax.device_put((jnp.asarray(v, jnp.float32), jnp.asarray(f, jnp.int32)))
    T = len(f)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def render_scan(v, f, rot, trans, fl, pp, *, cap):
        def step(acc, view):
            r, t, fl_, pp_ = view
            tri, z, ov = dense.rasterize(
                v, f, r, t, fl_, pp_, height=H, width=W,
                e_cap_rows=0, micro_cap_rows=cap,
            )
            return acc + jnp.sum(tri[::64, ::64]) + ov, None
        acc, _ = jax.lax.scan(step, jnp.int32(0), (rot, trans, fl, pp))
        return acc

    print(f"dense preset T={T}, {NV} views; rows(cap) = 4*cap + HW")
    results = {}
    for cap in (T, 3 * T // 4, T // 2):   # full / -25% / -50% rows (timing probe;
        ms = timed(lambda: render_scan(v, f, rot, trans, fl, pp, cap=cap))
        rows = 4 * min(cap, T) + H * W
        results[cap] = (ms / NV, rows)
        print(f"  micro_cap={cap}: {ms/NV:.2f} ms/view @ {rows} rows"
              f"{' (exact)' if cap >= T else ' (drops rows; timing only)'}")
    (m_full, r_full) = results[T]
    (m_half, r_half) = results[T // 2]
    rate = (m_full - m_half) * 1e6 / (r_full - r_half)
    print(f"in-pipeline marginal: {rate:.2f} ns/row "
          f"(standalone beta = 7.5; split saves ~{rate * 1.23e6 / 1e6:.1f} ms/view if linear)")

if __name__ == "__main__":
    main()
