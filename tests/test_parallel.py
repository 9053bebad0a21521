import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.parallel import (
    make_spp_mesh, render_super_sharded,
)
from tests.test_render_super import small_scene


def test_mesh_has_8_virtual_devices():
    assert jax.device_count() == 8


def test_sharded_render_matches_single_device():
    """spp sharded over 8 devices + psum == single-device render.

    Counter-based RNG makes the drawn samples identical; only float
    summation order differs."""
    scene = small_scene()
    key = make_key(21)
    w = h = 16
    spp = 16
    single = np.asarray(render_super(key, scene, w, h, spp=spp))
    mesh = make_spp_mesh(8)
    sharded = np.asarray(render_super_sharded(key, scene, w, h, spp, mesh))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)


def test_sharded_render_subset_mesh():
    scene = small_scene()
    key = make_key(22)
    mesh = make_spp_mesh(2)
    f = np.asarray(render_super_sharded(key, scene, 8, 8, 4, mesh))
    single = np.asarray(render_super(key, scene, 8, 8, spp=4))
    np.testing.assert_allclose(f, single, rtol=0, atol=2e-3)


def test_sharded_bidirectional_matches_single():
    from opencl_montecarlo_path_tracing_tpu.models.bidirectional import (
        render_bidirectional,
    )
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_bidirectional_sharded,
    )
    scene = small_scene()
    key = make_key(23)
    single = np.asarray(render_bidirectional(key, scene, 8, 8, spp=4,
                                             n_vlp=32))
    sharded = np.asarray(render_bidirectional_sharded(
        key, scene, 8, 8, 4, make_spp_mesh(4), n_vlp=32))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)


def test_sharded_trianglegrid_matches_single():
    from opencl_montecarlo_path_tracing_tpu.models.trianglegrid import (
        render_trianglegrid,
    )
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_trianglegrid_sharded,
    )
    scene = small_scene()
    key = make_key(25)
    single = np.asarray(render_trianglegrid(key, scene, 8, 8, spp=4))
    sharded = np.asarray(render_trianglegrid_sharded(
        key, scene, 8, 8, 4, make_spp_mesh(4)))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)


def test_sharded_sample_parallel_matches_single():
    """Row-sharded NoDoF == single-device, bit-for-bit (uint8 output and
    per-pixel reduction make the summation order identical too)."""
    from opencl_montecarlo_path_tracing_tpu.models.sample_parallel import (
        render_sample_parallel,
    )
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_sample_parallel_sharded,
    )
    scene = small_scene()
    key = make_key(26)
    single = np.asarray(render_sample_parallel(key, scene, 8, 8,
                                               sample_grid=2))
    sharded = np.asarray(render_sample_parallel_sharded(
        key, scene, 8, 8, sample_grid=2, mesh=make_spp_mesh(4, axis="y")))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_simple_matches_single():
    """spp-sharded multi-bounce mirror tracer == single-device render
    (CLSimplePathTracer family; the scene is built in, no scene arg)."""
    from opencl_montecarlo_path_tracing_tpu.models.simple import render_simple
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_simple_sharded,
    )
    key = make_key(27)
    single = np.asarray(render_simple(key, 8, 8, spp=8))
    sharded = np.asarray(render_simple_sharded(key, 8, 8, 8,
                                               make_spp_mesh(4)))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)


def test_sharded_metropolis_grid_mode_matches_single():
    """The vlpgrid variant's grid-limited gather
    (CLSuperMetropolisPathTracer_vlpgrid/metropolispathtracer.ocl:326-349)
    under shard_map == single-device."""
    from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
        render_metropolis,
    )
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_metropolis_sharded,
    )
    scene = small_scene()
    key = make_key(28)
    single = np.asarray(render_metropolis(key, scene, 8, 8, spp=4,
                                          n_seedpaths=16, mutation_rounds=2,
                                          use_grid=True))
    sharded = np.asarray(render_metropolis_sharded(
        key, scene, 8, 8, 4, make_spp_mesh(2), n_seedpaths=16,
        mutation_rounds=2, use_grid=True))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)


def test_sharded_metropolis_matches_single():
    from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
        render_metropolis,
    )
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_metropolis_sharded,
    )
    scene = small_scene()
    key = make_key(24)
    single = np.asarray(render_metropolis(key, scene, 8, 8, spp=4,
                                          n_seedpaths=16, mutation_rounds=2))
    sharded = np.asarray(render_metropolis_sharded(
        key, scene, 8, 8, 4, make_spp_mesh(2), n_seedpaths=16,
        mutation_rounds=2))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)
