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


def test_grid_render_matches_brute_force():
    """DDA-traversed render must equal the brute-force render bit-for-bit
    (same RNG streams, same estimator; only the triangle scan differs)."""
    key = make_key(17)
    for scene in (torus_scene(), small_scene()):
        brute = np.asarray(render_super(key, scene, 24, 24, spp=4))
        gridded = np.asarray(render_trianglegrid(key, scene, 24, 24, spp=4))
        np.testing.assert_allclose(gridded, brute, rtol=0, atol=1e-4)


def test_grid_render_host_build_matches_device_build():
    key = make_key(18)
    scene = torus_scene()
    a = np.asarray(render_trianglegrid(key, scene, 16, 16, spp=2,
                                       device_build=True))
    b = np.asarray(render_trianglegrid(key, scene, 16, 16, spp=2,
                                       device_build=False))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)
