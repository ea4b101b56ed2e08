"""Communication-structure assertions for the sharded fusion paths.

Real multi-chip hardware is unavailable in CI, so beyond the numeric
equality tests (test_distributed*.py) we pin down the *collective
structure* of `make_sharded_fuse` by jaxpr inspection — the property that
makes the design weak-scale (SURVEY.md §2c; docs/PERFORMANCE.md "Weak
scaling cost model"):

- per view (inside the lax.scan body): exactly ONE psum, over the
  'pixels' axis only, of the (P, C+1) per-view partial — the per-view
  pixel-count merge. No 'views'-axis traffic per view.
- per program (outside the scan): exactly ONE (P, C) psum over 'views'
  — the accumulator merge happens once per fuse call, not once per view
  — plus one scalar overflow psum over both axes.
- no other collectives anywhere (no all_gather / ppermute / all_to_all /
  reduce_scatter): inputs are view-sharded, the mesh is replicated, and
  nothing else moves.
- shard_primitives=True (the huge-P memory mode) replaces the once-per-
  call (P, C) all-reduce with a per-view (P, C) ring reduce-scatter over
  'views' (half the bytes per merge; the scan carry holds only
  P / n_chips rows) — asserted as exactly one reduce_scatter inside the
  scan and NO (P, C) psum anywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from semantic_meshes import distributed, testing
from semantic_meshes.data import stack_cameras

COLLECTIVES = (
    "ppermute", "all_gather", "all_to_all", "reduce_scatter", "pgather",
    "pmin", "pmax",
)


def _sub_jaxprs(v):
    if hasattr(v, "eqns"):
        yield v
    elif hasattr(v, "jaxpr"):
        yield v.jaxpr
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _sub_jaxprs(x)


def collect_collectives(jaxpr, path="root"):
    """[(path, primitive_name, axes, input_shapes)] for every collective."""
    out = []
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if "psum" in name or name in COLLECTIVES:
            axes = eqn.params.get("axes", None)
            if axes is None:  # reduce_scatter names its axis differently
                axes = eqn.params.get("axis_name", ())
            if not isinstance(axes, tuple):
                axes = (axes,)
            out.append((
                path,
                name,
                axes,
                [tuple(v.aval.shape) for v in eqn.invars],
            ))
        for v in eqn.params.values():
            for sj in _sub_jaxprs(v):
                out.extend(collect_collectives(sj, path + "/" + name))
    return out


@pytest.fixture(scope="module")
def scene():
    vertices, faces = testing.make_cube(subdivisions=3)
    H, W, C, N = 32, 64, 5, 4
    cams = testing.make_ring_cameras(num_views=N, width=W, height=H)
    rng = np.random.default_rng(0)
    probs = jnp.asarray(rng.random((N, H, W, C), np.float32))
    return vertices, faces, cams, probs, H, W


def _trace(mesh, scene, **kw):
    vertices, faces, cams, probs, H, W = scene
    rot, trans, fl, pp = stack_cameras(cams)
    num_primitives = kw.pop("num_primitives", len(faces))
    fuse = distributed.make_sharded_fuse(
        mesh, num_primitives=num_primitives,
        aggregator=kw.pop("aggregator", "sum"),
        height=H, width=W, **kw,
    )
    jaxpr = jax.make_jaxpr(fuse)(
        jnp.asarray(vertices), jnp.asarray(faces), rot, trans, fl, pp,
        probs, jnp.float32(0.5),
    )
    return collect_collectives(jaxpr.jaxpr), num_primitives, probs.shape[-1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
class TestCollectiveStructure:
    def test_views_by_pixels_mesh(self, scene):
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("views", "pixels"))
        colls, P, C = _trace(mesh, scene)
        names = {c[1] for c in colls}
        assert names <= {"psum", "psum2", "psum_invariant"}, colls

        in_scan = [c for c in colls if "/scan" in c[0]]
        outside = [c for c in colls if "/scan" not in c[0]]
        # one per-view psum, 'pixels' only, of the (P, C+1) partial
        assert len(in_scan) == 1, in_scan
        assert in_scan[0][2] == ("pixels",)
        assert in_scan[0][3] == [(P, C + 1)]
        # one (P, C) views-merge + one scalar overflow psum per program
        assert sorted(c[2] for c in outside) == [
            ("views",), ("views", "pixels")
        ], outside
        views_merge = next(c for c in outside if c[2] == ("views",))
        assert views_merge[3] == [(P, C)]
        overflow = next(c for c in outside if c[2] == ("views", "pixels"))
        assert overflow[3] == [()]

    def test_views_only_mesh_has_no_per_view_traffic(self, scene):
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1),
                    ("views", "pixels"))
        colls, P, C = _trace(mesh, scene)
        in_scan = [c for c in colls if "/scan" in c[0]]
        # 'pixels' has size 1; the per-view psum still appears in the
        # jaxpr but moves zero bytes — assert no 'views' traffic per view
        assert all(c[2] == ("pixels",) for c in in_scan), in_scan
        outside = [c for c in colls if "/scan" not in c[0]]
        assert [c for c in outside if "views" in c[2] and c[3] == [(P, C)]]

    def test_shard_primitives_reduce_scatter_structure(self, scene):
        # huge-P mode: the (P, C) views merge becomes a per-view ring
        # reduce-scatter INSIDE the scan (half an all-reduce's bytes, and
        # the scan carry holds only P / n_chips rows); the 'pixels'
        # direction stays a local slice (no traffic). No (P, C) psum may
        # remain anywhere.
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("views", "pixels"))
        colls, P, C = _trace(
            mesh, scene, shard_primitives=True, num_primitives=112
        )

        in_scan = [c for c in colls if "/scan" in c[0]]
        rs = [c for c in in_scan if c[1] == "reduce_scatter"]
        assert len(rs) == 1, in_scan
        assert rs[0][2] == ("views",) and rs[0][3] == [(P, C)], rs
        # the per-view pixel-count psum is unchanged
        counts = [c for c in in_scan if "psum" in c[1]]
        assert len(counts) == 1 and counts[0][2] == ("pixels",), in_scan

        outside = [c for c in colls if "/scan" not in c[0]]
        # only the scalar overflow psum remains outside the scan
        assert [(c[2], c[3]) for c in outside] == [
            (("views", "pixels"), [()])
        ], outside

    def test_shard_primitives_requires_divisible_p(self, scene):
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("views", "pixels"))
        vertices, faces, cams, probs, H, W = scene
        with pytest.raises(ValueError, match="chip count"):
            distributed.make_sharded_fuse(
                mesh, num_primitives=len(faces) * 8 + 1, aggregator="sum",
                height=H, width=W, shard_primitives=True,
            )

    def test_faces_axis_adds_two_pmins_per_view(self, scene):
        # mesh (triangle) input sharding: the per-view winner merge is
        # exactly two (H_band, W) pmins over 'faces' (z bits, then the
        # masked ids — the lexicographic minimum), plus the unchanged
        # per-view pixels psum; the accumulator merge stays one psum over
        # 'views' and overflow sums over all three axes
        mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                    ("views", "pixels", "faces"))
        colls, P, C = _trace(mesh, scene)

        in_scan = [c for c in colls if "/scan" in c[0]]
        pmins = [c for c in in_scan if c[1] == "pmin"]
        H_band, W = 32 // 2, 64
        assert [(c[2], c[3]) for c in pmins] == [
            (("faces",), [(H_band, W)]),
            (("faces",), [(H_band, W)]),
        ], in_scan
        counts = [c for c in in_scan if "psum" in c[1]]
        assert len(counts) == 1 and counts[0][2] == ("pixels",)
        assert counts[0][3] == [(P, C + 1)]

        outside = [c for c in colls if "/scan" not in c[0]]
        assert sorted(c[2] for c in outside) == [
            ("views",), ("views", "pixels", "faces")
        ], outside

    def test_mul_aggregator_same_structure(self, scene):
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("views", "pixels"))
        colls, P, C = _trace(mesh, scene, aggregator="mul")
        in_scan = [c for c in colls if "/scan" in c[0]]
        assert len(in_scan) == 1 and in_scan[0][2] == ("pixels",), in_scan
        outside = [c for c in colls if "/scan" not in c[0]]
        assert sorted(c[2] for c in outside) == [
            ("views",), ("views", "pixels")
        ], outside
