import numpy as np

from opencl_montecarlo_path_tracing_tpu.scene import load_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    procedural_super_scene, torus_mesh, write_scene_files, demo_scene,
)


def test_procedural_scene():
    s = procedural_super_scene()
    assert s.n_spheres == 2 and s.n_squares == 4 and s.n_lights == 2
    assert s.n_triangles == 96  # comparable to the reference mesh


def test_torus_mesh_closed():
    t = torus_mesh(n_major=6, n_minor=4)
    assert t.shape == (48, 3, 3)
    # all vertices within major+minor of the center
    c = np.float32([7.8, 5.0, 10.7])
    r = np.linalg.norm(t.reshape(-1, 3) - c, axis=-1)
    assert r.max() <= 0.6 + 0.25 + 1e-5


def test_scene_files_roundtrip(tmp_path):
    """write_scene_files exports the reference text formats; load_scene
    reads them back identically."""
    s = procedural_super_scene()
    write_scene_files(s, str(tmp_path))
    back = load_scene(str(tmp_path))
    np.testing.assert_array_equal(
        np.sort(back.sphere_centers, axis=0), np.sort(s.sphere_centers, axis=0))
    np.testing.assert_array_equal(
        np.sort(back.square_kj, axis=0), np.sort(s.square_kj, axis=0))
    np.testing.assert_allclose(back.triangles, s.triangles, atol=1e-5)
    np.testing.assert_allclose(back.lights, s.lights)


def test_demo_scene_fallback():
    s, tag = demo_scene(prefer_reference=False)
    assert tag == "builtin:procedural"
    assert s.n_triangles > 0


def test_large_mesh_scene_visible():
    """Round-4 regression guard: the large-mesh benchmark mesh must be a
    REAL rendering workload.  The reference estimator rejects triangles
    with |e0 x e2| < 0.01 (pathtracer.ocl:68, faithfully reproduced as
    ops/intersect._EPS), and the former dense torus fell under that
    cutoff past ~5k triangles - every large-mesh bench row rendered a
    mesh that could not shade a pixel.  Pins: (a) every sheet triangle
    clears the cutoff with margin at all bench densities, (b) the
    20k-tri scene's film differs from the no-mesh film (mesh visible)."""
    import jax
    from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
    from opencl_montecarlo_path_tracing_tpu.models.super import film_super
    from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
    from opencl_montecarlo_path_tracing_tpu.core.quirks import DEFAULT
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
        large_mesh_scene, ripple_sheet_mesh)
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene

    for nm in ((144, 72), (256, 128), (512, 256), (1024, 512)):
        t = ripple_sheet_mesh(*nm).astype(np.float64)
        det = np.linalg.norm(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1)
        assert det.min() >= 0.02, (nm, det.min())
        assert t.shape[0] == 2 * nm[0] * nm[1]

    scene = large_mesh_scene()
    scn = prep_scene(scene)
    empty = prep_scene(Scene(
        sphere_centers=scene.sphere_centers, square_kj=scene.square_kj,
        triangles=np.zeros((0, 3, 3), np.float32), lights=scene.lights))
    key = make_key(3)
    f_mesh = np.asarray(jax.jit(lambda k: film_super(
        k, scn, 64, 64, 1, 0, 1, DEFAULT, row_offset=224, rows=16))(key))
    f_none = np.asarray(jax.jit(lambda k: film_super(
        k, empty, 64, 64, 1, 0, 1, DEFAULT, row_offset=224, rows=16))(key))
    assert np.abs(f_mesh - f_none).max() > 0.1  # the mesh shades pixels
