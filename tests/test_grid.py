import numpy as np
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import grid as G
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.models.trianglegrid import render_trianglegrid
from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
from tests.test_render_super import small_scene


def torus_scene() -> Scene:
    return Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200], [15, 2, 7, 150]], np.float32),
    )


def _tri_aabbs(tris):
    return tris.min(axis=1), tris.max(axis=1)


def test_resolution_heuristic():
    res = G.grid_resolution([0, 0, 0], [4, 2, 1], n_items=96, modifier=3.0)
    assert all(1 <= r <= 128 for r in res)
    assert G.grid_resolution([0, 0, 0], [1, 1, 1], 0) == (1, 1, 1)


def test_device_build_matches_host_oracle():
    tris = torus_mesh(n_major=7, n_minor=5)
    amin, amax = _tri_aabbs(tris)
    vmin = amin.min(axis=0)
    vmax = amax.max(axis=0)
    res = G.grid_resolution(vmin, vmax, tris.shape[0], 3.0)
    cell = ((vmax - vmin) / np.asarray(res, np.float32)).astype(np.float32)

    host = G.build_grid_host(amin, amax, vmin, cell, res)
    span = np.floor((amax - amin) / np.maximum(cell, 1e-20)).astype(np.int64) + 2
    max_span = tuple(int(min(s, r)) for s, r in zip(span.max(axis=0), res))
    dev = G.build_grid_pairs(jnp.asarray(amin), jnp.asarray(amax),
                             vmin, cell, res, max_span=max_span)
    np.testing.assert_array_equal(np.asarray(dev.counts), host.counts)
    np.testing.assert_array_equal(np.asarray(dev.items), host.items)

    scan = G.build_grid_cellscan(jnp.asarray(amin), jnp.asarray(amax),
                                 vmin, cell, res, cell_chunk=16)
    np.testing.assert_array_equal(np.asarray(scan.counts), host.counts)
    np.testing.assert_array_equal(np.asarray(scan.items), host.items)


def test_cap_overflow_drops_extras():
    # 100 identical unit boxes in one cell, cap 8 -> first 8 kept
    n = 100
    amin = np.zeros((n, 3), np.float32)
    amax = np.ones((n, 3), np.float32) * 0.5
    g = G.build_grid_host(amin, amax, np.zeros(3, np.float32),
                          np.ones(3, np.float32), (1, 1, 1), cap=8)
    assert g.counts[0] == 8
    np.testing.assert_array_equal(g.items[0], np.arange(8))
    dev = G.build_grid_pairs(jnp.asarray(amin), jnp.asarray(amax),
                             np.zeros(3, np.float32), np.ones(3, np.float32),
                             (1, 1, 1), cap=8, max_span=(1, 1, 1))
    np.testing.assert_array_equal(np.asarray(dev.items[0]), np.arange(8))


def test_dda_traversal_matches_brute_on_hits():
    """Op-level: the DDA walk's closest hit must equal the brute triangle
    scan on rays AIMED AT the mesh (the render-level test below covers
    pipeline wiring, but its small window sees mostly sky - a traversal
    bug would hide there; round-2 finding)."""
    import functools
    import jax.numpy as jnp
    from opencl_montecarlo_path_tracing_tpu.core.quirks import DEFAULT
    from opencl_montecarlo_path_tracing_tpu.ops.intersect import (
        prep_scene, trace_ray)
    from opencl_montecarlo_path_tracing_tpu.models.trianglegrid import (
        _override)
    scene = torus_scene()
    scn = prep_scene(scene)
    tris = np.asarray(scene.triangles, np.float64)
    rng = np.random.RandomState(5)
    n = 512
    idx = rng.randint(0, tris.shape[0], n)
    bary = rng.dirichlet((1.0, 1.0, 1.0), n)
    pts = (tris[idx] * bary[:, :, None]).sum(axis=1)
    o = np.broadcast_to(np.array([17, 16, 8], np.float64), (n, 3))
    d = pts - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    o = np.concatenate([o, o]).astype(np.float32)
    d = np.concatenate([d, -d]).astype(np.float32)   # + guaranteed misses
    brute = trace_ray(jnp.asarray(o), jnp.asarray(d), scn, quirks=DEFAULT,
                      sphere_material=3)
    grid, _box = G.triangle_grid(scn, modifier=3.0, device=False)
    grid = G.UniformGrid(items=jnp.asarray(grid.items),
                         counts=jnp.asarray(grid.counts), res=grid.res,
                         vmin=jnp.asarray(grid.vmin),
                         cell_size=jnp.asarray(grid.cell_size))
    dda = trace_ray(jnp.asarray(o), jnp.asarray(d), scn, quirks=DEFAULT,
                    sphere_material=3,
                    tri_override=functools.partial(_override, scn=scn,
                                                   grid=grid,
                                                   quirks=DEFAULT))
    bm = np.asarray(brute.material)
    assert (bm == 4).sum() > 300, (bm == 4).sum()   # rays really hit
    np.testing.assert_array_equal(np.asarray(dda.material), bm)
    np.testing.assert_allclose(np.asarray(dda.t), np.asarray(brute.t),
                               rtol=0, atol=1e-4)
    hit = bm == 4
    np.testing.assert_allclose(np.asarray(dda.normal)[hit],
                               np.asarray(brute.normal)[hit],
                               rtol=0, atol=1e-5)


def test_grid_render_matches_brute_force():
    """DDA-traversed render must equal the brute-force render bit-for-bit
    (same RNG streams, same estimator; only the triangle scan differs).
    Rendered over the band where the meshes are actually visible
    (rows ~142-180, cols ~400-464 - a window at the origin is all sky)."""
    key = make_key(17)
    for scene in (torus_scene(), small_scene()):
        brute = np.asarray(render_super(key, scene, 472, 180, spp=2))
        gridded = np.asarray(render_trianglegrid(key, scene, 472, 180,
                                                 spp=2))
        assert (np.abs(brute[150:, 400:]).var() > 1e-6)
        np.testing.assert_allclose(gridded, brute, rtol=0, atol=1e-4)


def test_grid_render_host_build_matches_device_build():
    key = make_key(18)
    scene = torus_scene()
    a = np.asarray(render_trianglegrid(key, scene, 16, 16, spp=2,
                                       device_build=True))
    b = np.asarray(render_trianglegrid(key, scene, 16, 16, spp=2,
                                       device_build=False))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
