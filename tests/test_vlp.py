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


def test_vlp_grid_dynamic_res_reference_formula():
    """r3 VERDICT #5: the opt-in dynamic grid resolution reproduces the
    reference's box-derived formula (vlpgrid .c:629-636) on a known VLP
    set: res_i = clamp(floor(size_i * cbrt(CSM * N_VLP / prod(size))),
    1, 128) with the anisotropic box, including the per-axis clamps."""
    vlps = np.array([
        [0.0, 0.0, 0.0, 1.0],     # radius 16 -> lo corner -16
        [40.0, 4.0, 0.5, 0.25],   # radius 8  -> hi x = 48
        [5.0, 5.0, 5.0, 0.0],     # dead: must not touch the box
    ], np.float32)
    lo, hi = V.vlp_bounds(jnp.asarray(vlps))
    lo, hi = np.asarray(lo), np.asarray(hi)
    n_vlp, csm = 12, 3.0
    got = V.vlp_grid_dynamic_res(lo, hi, n_vlp, csm)
    # the C formula, computed independently
    size = hi - lo
    cube = np.cbrt(csm * n_vlp / (size[0] * size[1] * size[2]))
    want = tuple(int(max(1, min(int(np.floor(size[i] * cube)), 128)))
                 for i in range(3))
    assert got == want
    assert got[0] != got[1] or got[1] != got[2]  # anisotropic, not cubic
    # empty/inverted box (no live VLPs): the reference divides by zero
    # here; the rebuild clamps to 1x1x1
    big = np.float32(3.4e38)
    assert V.vlp_grid_dynamic_res([big] * 3, [-big] * 3, 64) == (1, 1, 1)
    # clamp to 128 on a tiny box
    assert V.vlp_grid_dynamic_res([0, 0, 0], [1e-3, 1e-3, 1e-3],
                                  10**9) == (128, 128, 128)


def test_render_metropolis_dynamic_grid_res_mode():
    """The dynamic_grid_res parity mode engages (box-derived res != the
    static cube on the demo scene) and equals a manual render through
    film_metropolis with the same precomputed VLPs + grid_res."""
    import jax
    from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
    from opencl_montecarlo_path_tracing_tpu.core.quirks import DEFAULT
    from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
    from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
        mlt_vlps, film_metropolis, render_metropolis)
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene
    scene, _ = demo_scene()
    scn = prep_scene(scene)
    key = make_key(41)
    nseed, rounds = 64, 2
    vlps = mlt_vlps(key, scn, nseed, rounds)
    lo, hi = (np.asarray(b) for b in V.vlp_bounds(vlps))
    assert lo[0] < hi[0]          # live VLPs: the box is real
    res = V.vlp_grid_dynamic_res(lo, hi, int(vlps.shape[0]))
    # (on a near-cubic box the reference formula reduces to the static
    # count cube - s * cbrt(CSM*N/s^3) == cbrt(CSM*N) - so equality with
    # the static res here is expected, not a failure to engage; the
    # anisotropic unit test above pins the box-shaped behavior)
    dyn = np.asarray(render_metropolis(
        key, scene, 32, 32, spp=2, n_seedpaths=nseed,
        mutation_rounds=rounds, use_grid=True, dynamic_grid_res=True))
    manual = np.asarray(jax.jit(lambda k, v: film_metropolis(
        k, scn, 32, 32, 2, 0, 2, nseed, rounds, DEFAULT,
        use_grid=True, precomputed_vlps=v, grid_res=res))(key, vlps))
    np.testing.assert_array_equal(dyn, manual)
