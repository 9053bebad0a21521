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
