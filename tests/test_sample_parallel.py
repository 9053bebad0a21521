import numpy as np

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.models.sample_parallel import (
    render_sample_parallel,
)
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.utils.pam import film_to_rgba8
from tests.test_render_super import small_scene


def test_matches_spp_loop_layout():
    """Sample-parallel layout == spp-loop layout, the reproducibility
    property the reference lacks (its RNG is keyed on work-item ids)."""
    key = make_key(31)
    scene = small_scene()
    w = h = 16
    img, buf = render_sample_parallel(key, scene, w, h, sample_grid=4,
                                      return_samples=True)
    img = np.asarray(img)
    buf = np.asarray(buf)
    film = np.asarray(render_super(key, scene, w, h, spp=16))
    # the reduced sample buffer equals the accumulated film
    reduced = buf.reshape(h, 4, w, 4, 3).sum(axis=(1, 3))
    np.testing.assert_allclose(reduced, film, rtol=0, atol=2e-3)
    # and the final image equals the quantised film
    np.testing.assert_array_equal(img, film_to_rgba8(film))


def test_image_shape_and_alpha():
    img = np.asarray(render_sample_parallel(make_key(1), small_scene(),
                                            8, 8, sample_grid=2))
    assert img.shape == (8, 8, 4)
    assert img.dtype == np.uint8
    assert (img[..., 3] == 255).all()
