import numpy as np
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.core.quirks import Quirks
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.ops import vlp as V
from tests.test_render_super import small_scene


def test_uniform_sphere_distribution():
    u = np.random.default_rng(0).random((2, 20000)).astype(np.float32)
    d = np.asarray(V.uniform_sphere(jnp.asarray(u[0]), jnp.asarray(u[1])))
    np.testing.assert_allclose((d * d).sum(-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.02
    # z uniform in [-1, 1]
    assert abs((d[:, 2] < 0).mean() - 0.5) < 0.02


def vlp_scene():
    """A light directly below a square: upward rays hit the plane z=12 with
    direction . normal > 0, the only way SampleFromLightSource yields a live
    VLP (lamb = dot(direction, normal), bidirectionalpathtracer.ocl:250 -
    floor and sphere hits always see lamb < 0 and emit nothing)."""
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    return Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.array([[10, 8]], np.float32),  # plane z = 12, x ~ 10
        triangles=np.zeros((0, 3, 3), np.float32),
        lights=np.array([[10, 0, 8, 200]], np.float32),
    )


def test_emit_vlps_properties():
    scn = prep_scene(vlp_scene())
    vlps = np.asarray(V.emit_vlps(make_key(3), scn, n_vlp=2048))
    assert vlps.shape == (2048, 4)
    assert np.isfinite(vlps).all()
    live = vlps[vlps[:, 3] > 0]
    assert live.shape[0] > 5, live.shape
    # live VLPs sit on the square plane z=12 within its 2x2 extent
    np.testing.assert_allclose(live[:, 2], 12.0, atol=1e-3)
    assert (np.abs(live[:, 0] - 10) < 1).all()
    assert (np.abs(live[:, 1]) < 1).all()
    # square = material 3 -> base 40, scale_den = max(1, 2048 // 512) = 4
    assert live[:, 3].max() <= 40.0 / 4 + 1e-5
    # hit-but-unlit surfaces keep their position with intensity 0 (the
    # reference returns (intersection, 0) when lamb <= 0, ocl:253-276);
    # only misses are fully zeroed - so dead rows exist in both forms
    assert (vlps[:, 3] >= 0).all()


def test_emit_vlps_reuse_direction_quirk():
    """With the reference's reuse bug, light l >= 1 reuses light 0's
    direction: the two lights' VLP hit patterns become correlated."""
    scn = prep_scene(small_scene())
    a = np.asarray(V.emit_vlps(make_key(3), scn, n_vlp=64))
    b = np.asarray(V.emit_vlps(make_key(3), scn, n_vlp=64,
                               quirks=Quirks.reference()))
    assert not np.array_equal(a, b)


def test_gather_vlps_matches_naive():
    rng = np.random.default_rng(7)
    R, Vn = 300, 50
    x = rng.normal(5, 3, (R, 3)).astype(np.float32)
    n = rng.normal(0, 1, (R, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    vlps = rng.normal(5, 3, (Vn, 4)).astype(np.float32)
    vlps[:, 3] = np.abs(vlps[:, 3])
    vlps[::5, 3] = 0.0  # dead VLPs skipped

    got = np.asarray(V.gather_vlps(jnp.asarray(x), jnp.asarray(n),
                                   jnp.asarray(vlps)))

    want = np.zeros(R, np.float64)
    for i in range(Vn):
        if vlps[i, 3] <= 0:
            continue
        diff = vlps[i, :3] - x
        dist = np.sqrt((diff ** 2).sum(-1))
        lamb = (diff * n).sum(-1) / dist
        c = np.where(lamb < 0, 0.0,
                     lamb * np.minimum(vlps[i, 3] / dist ** 2, 1.0))
        want += c
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grid_gather_matches_dense_when_grid_covers_all():
    """With cap >= n_vlp every cell holds every overlapping VLP; for points
    inside the grid whose cell is covered by all live VLP radii, the grid
    gather equals the dense gather."""
    rng = np.random.default_rng(3)
    Vn = 20
    vlps = np.zeros((Vn, 4), np.float32)
    vlps[:, :3] = rng.normal(5, 1, (Vn, 3))
    vlps[:, 3] = 1.0  # radius 16 >> grid extent: every VLP covers every cell
    grid = V.build_vlp_grid(jnp.asarray(vlps), (4, 4, 4), cap=Vn)
    counts = np.asarray(grid.counts)
    assert (counts == Vn).all()

    x = rng.normal(5, 0.5, (64, 3)).astype(np.float32)
    n = np.tile(np.float32([0, 0, 1]), (64, 1))
    dense = np.asarray(V.gather_vlps(jnp.asarray(x), jnp.asarray(n),
                                     jnp.asarray(vlps)))
    gridded = np.asarray(V.gather_vlps_grid(jnp.asarray(x), jnp.asarray(n),
                                            jnp.asarray(vlps), grid))
    inside = ((x >= np.asarray(grid.vmin)) &
              (x < np.asarray(grid.vmin) + np.asarray(grid.cell_size) * 4
               )).all(-1)
    assert inside.any()
    np.testing.assert_allclose(gridded[inside], dense[inside],
                               rtol=1e-4, atol=1e-4)


def test_vlp_bounds():
    vlps = np.array([[1, 2, 3, 4.0], [5, 6, 7, 0.0]], np.float32)
    lo, hi = V.vlp_bounds(jnp.asarray(vlps))
    r = 16 * 2.0
    np.testing.assert_allclose(np.asarray(lo), [1 - r, 2 - r, 3 - r])
    np.testing.assert_allclose(np.asarray(hi), [1 + r, 2 + r, 3 + r])


def test_gather_mxu_matches_scan():
    """The Pallas MXU gather (interpret mode on CPU) == the VPU scan on a
    batch big and awkward enough to exercise ray and VLP tile padding."""
    from opencl_montecarlo_path_tracing_tpu.ops.pallas_vlp import (
        gather_vlps_mxu)
    rng = np.random.default_rng(11)
    R, Vn = 777, 130   # neither a tile multiple
    x = rng.normal(5, 3, (R, 3)).astype(np.float32)
    n = rng.normal(0, 1, (R, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    vlps = rng.normal(5, 3, (Vn, 4)).astype(np.float32)
    vlps[:, 3] = np.abs(vlps[:, 3])
    vlps[::5, 3] = 0.0
    scan = np.asarray(V.gather_vlps(jnp.asarray(x), jnp.asarray(n),
                                    jnp.asarray(vlps), impl="scan"))
    mxu = np.asarray(gather_vlps_mxu(jnp.asarray(x), jnp.asarray(n),
                                     jnp.asarray(vlps), interpret=True))
    np.testing.assert_allclose(mxu, scan, rtol=2e-4, atol=2e-4)
