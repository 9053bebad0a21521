import os

import numpy as np
import pytest

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.core.quirks import Quirks
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.models.oracle_super import render_oracle_super
from opencl_montecarlo_path_tracing_tpu.scene import load_scene
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
from tests.conftest import REFERENCE_DIR, reference_available


def small_scene() -> Scene:
    """A hand-built scene exercising every primitive class and material."""
    return Scene(
        sphere_centers=np.array([[10, 0, 4], [11, 0, 11]], np.float32),
        square_kj=np.array([[12, 0], [7, 6]], np.float32),
        triangles=np.array([
            [[8, 5, 10], [7.5, 5.3, 10.6], [7.6, 5.1, 10.7]],
            [[6, 4, 10.5], [6.3, 4.1, 10.9], [6.2, 4.0, 11.0]],
        ], np.float32),
        lights=np.array([[10, 4, 10, 200], [15, 2, 7, 150]], np.float32),
    )


def rmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(((a - b) ** 2).mean()))


def test_smoke_small_scene():
    key = make_key(3)
    f = np.asarray(render_super(key, small_scene(), 24, 24, spp=4))
    assert f.shape == (24, 24, 3)
    assert np.isfinite(f).all()
    assert f.max() > 0


def test_matches_oracle_super():
    """Independent-RNG statistical agreement on a content band (rows
    372+, cols 256+ hold floor + diffuse geometry; a small window at the
    origin is all sky and the comparison there pins only the camera -
    round-2 finding)."""
    scene = small_scene()
    key = make_key(11)
    w, rows, r0 = 296, 12, 372
    spp = 128
    tpu = np.asarray(render_super(key, scene, w, r0 + rows,
                                  spp=spp))[r0:] / spp
    orc = render_oracle_super(scene, w, rows, spp=spp, seed=5,
                              row_offset=r0) / spp
    assert float(np.asarray(orc).var()) > 1e-4  # content, not sky
    err = rmse(tpu, orc)
    scale = max(1e-6, float(np.abs(orc).mean()))
    assert err / scale < 0.08, (err, scale)
    c = np.corrcoef(tpu.reshape(-1), orc.reshape(-1))[0, 1]
    assert c > 0.98, c


def test_quirks_reference_mode_changes_shadows():
    """accept_negative_t lets geometry behind a shadow-ray origin occlude;
    on a scene with a triangle 'behind' the lit floor region the images
    must differ."""
    scene = small_scene()
    key = make_key(4)
    a = np.asarray(render_super(key, scene, 32, 32, spp=8))
    b = np.asarray(render_super(key, scene, 32, 32, spp=8,
                                quirks=Quirks.reference()))
    assert a.shape == b.shape
    # Not asserting inequality pixel-wise (scene-dependent); at least the
    # computation must be finite and deterministic per mode.
    np.testing.assert_array_equal(
        b, np.asarray(render_super(key, scene, 32, 32, spp=8,
                                   quirks=Quirks.reference())))


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_reference_scene_smoke():
    scene = load_scene(os.path.join(REFERENCE_DIR, "CLSuperPathTracer"))
    key = make_key(9)
    f = np.asarray(render_super(key, scene, 16, 16, spp=2))
    assert np.isfinite(f).all()
    assert f.max() > 0


def test_five_lights_unrolled_loop():
    """MAX_LIGHTS=5 in the reference; exercise the statically unrolled light
    loop beyond the 2-light scenes."""
    scene = Scene(
        sphere_centers=np.array([[10, 0, 4]], np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=np.zeros((0, 3, 3), np.float32),
        lights=np.array([[10, 4, 10, 200], [15, 2, 7, 150], [5, 5, 9, 80],
                         [12, -3, 6, 60], [8, 1, 12, 40]], np.float32),
    )
    f = np.asarray(render_super(make_key(8), scene, 16, 16, spp=2))
    assert np.isfinite(f).all() and f.max() > 0


def test_zero_light_scene():
    scene = Scene(
        sphere_centers=np.array([[10, 0, 4]], np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=np.zeros((0, 3, 3), np.float32),
        lights=np.zeros((0, 4), np.float32),
    )
    f = np.asarray(render_super(make_key(8), scene, 8, 8, spp=1))
    assert np.isfinite(f).all()  # sky + unlit shading only
