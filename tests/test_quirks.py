"""Quirk toggles must actually change behaviour where documented."""

import numpy as np
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.quirks import Quirks, DEFAULT
from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import intersect as I
from opencl_montecarlo_path_tracing_tpu.ops import grid as G
from opencl_montecarlo_path_tracing_tpu.models.simple import render_simple
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene


def test_negative_t_triangle_quirk():
    """A triangle strictly BEHIND the ray origin: intended math misses,
    the reference quirk (no positivity check, pathtracer.ocl:129) hits with
    a negative distance."""
    tri = np.array([[[-1, -1, -5], [1, -1, -5], [0, 1, -5]]], np.float32)
    scene = Scene(sphere_centers=np.zeros((0, 3), np.float32),
                  square_kj=np.zeros((0, 2), np.float32),
                  triangles=tri,
                  lights=np.zeros((0, 4), np.float32))
    scn = I.prep_scene(scene)
    o = jnp.asarray([[0.0, 0.0, 5.0]] * 8)   # z=5, triangle at z=-5
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 8)   # pointing AWAY (up)
    # intended: no triangle hit (only m=0 sky, since floor needs dz<0)
    r = I.trace_ray(o, d, scn, quirks=DEFAULT)
    assert (np.asarray(r.material) == 0).all()
    # reference quirk: the backwards hit wins with t = -10
    rq = I.trace_ray(o, d, scn, quirks=Quirks.reference())
    assert (np.asarray(rq.material) == 4).all()
    np.testing.assert_allclose(np.asarray(rq.t), -10.0, atol=1e-4)


def test_negative_t_square_quirk():
    scene = Scene(sphere_centers=np.zeros((0, 3), np.float32),
                  square_kj=np.array([[0.0, 0.0]], np.float32),  # plane z=4
                  triangles=np.zeros((0, 3, 3), np.float32),
                  lights=np.zeros((0, 4), np.float32))
    scn = I.prep_scene(scene)
    o = jnp.asarray([[0.0, 0.0, 8.0]] * 8)   # above the plane
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 8)   # moving away from it
    r = I.trace_ray(o, d, scn, quirks=DEFAULT)
    assert (np.asarray(r.material) == 0).all()
    rq = I.trace_ray(o, d, scn, quirks=Quirks.reference())
    assert (np.asarray(rq.material) == 3).all()


def test_specular_divfact_quirk_changes_simple_render():
    """The divFact multiply/divide deviation only matters for highlights on
    bounce >= 1; the mirror-sphere scene produces them at moderate spp."""
    key = make_key(3)
    a = np.asarray(render_simple(key, 256, 256, spp=8))
    b = np.asarray(render_simple(key, 256, 256, spp=8,
                                 quirks=Quirks(specular_divfact_multiply=True)))
    assert a.shape == b.shape
    diff = np.abs(a - b)
    assert diff.max() > 0, "quirk had no effect anywhere"
    # only a small fraction of pixels see multi-bounce highlights
    assert 0 < (diff > 0).mean() < 0.2


def test_shadow_carry_t_quirk():
    """The _lmem binaries alias the running primary-hit distance into their
    shadow traces (CLSuperPathTracer_lmem/pathtracer.ocl:178): an occluder
    beyond the carried t does NOT occlude, and each executed shadow trace
    overwrites the carry.  Three regimes on a two-light scene:

      default           : both lights occluded (uncapped shadow rays)
      carry, t_hit = 12 : light 0's occluder (dist ~9) < 12 occludes and
                          overwrites the carry to ~9; light 1's occluder
                          (dist ~19) > 9 no longer occludes
      carry, t_hit = 5  : both occluders are beyond the carry - no occlusion
    """
    from opencl_montecarlo_path_tracing_tpu.models.super import illum_direct

    scene = Scene(
        sphere_centers=np.array([[0, 0, 11], [0, 20, 1]], np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=np.zeros((0, 3, 3), np.float32),
        lights=np.array([[0, 0, 21, 100], [0, 40, 1, 100]], np.float32))
    scn = I.prep_scene(scene)
    key = make_key(11)
    R = 8
    x = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (R, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 2**-0.5, 2**-0.5]), (R, 3))
    shading = jnp.ones(R, bool)
    zero = jnp.zeros(R, jnp.float32)
    ray_id = jnp.arange(R, dtype=jnp.uint32)
    carry = Quirks(shadow_carry_t=True)

    def illum(quirks, t_hit):
        ti, _ = illum_direct(key, scn, quirks, None, jnp.uint32(0), x, n,
                             shading, zero, ray_id,
                             jnp.full(R, t_hit, jnp.float32))
        return np.asarray(ti)

    base = illum(DEFAULT, 12.0)
    np.testing.assert_allclose(base, 0.0, atol=1e-7)   # both lights occluded
    mid = illum(carry, 12.0)                           # light 1 only
    assert (0.005 < mid).all() and (mid < 0.02).all(), mid
    free = illum(carry, 5.0)                           # both lights free
    assert (free > mid + 0.03).all(), (free, mid)


def test_grid_stats():
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    scene = Scene(sphere_centers=np.zeros((0, 3), np.float32),
                  square_kj=np.zeros((0, 2), np.float32),
                  triangles=torus_mesh(),
                  lights=np.zeros((0, 4), np.float32))
    grid, _ = G.triangle_grid(I.prep_scene(scene), device=False)
    s = G.grid_stats(grid)
    assert s["total_nels"] >= scene.triangles.shape[0]
    assert 0 < s["occupied_cells"] <= s["ncells"]
    assert s["max_nels"] <= s["capacity"]
