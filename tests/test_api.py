import numpy as np
import pytest

import opencl_montecarlo_path_tracing_tpu as pt
from tests.test_render_super import small_scene


def test_render_dispatch_all_variants():
    scene = small_scene()
    for variant in ("super", "superlmem", "trianglegrid", "bidirectional",
                    "metropolis", "metropolis_vlpgrid"):
        kw = {}
        if variant.startswith("metropolis"):
            kw = dict(n_seedpaths=8, mutation_rounds=1)
        if variant == "bidirectional":
            kw = dict(n_vlp=16)
        film = np.asarray(pt.render(variant, scene, 8, 8, spp=1, seed=1, **kw))
        assert film.shape == (8, 8, 3), variant
        assert np.isfinite(film).all(), variant

    film = np.asarray(pt.render("simple", None, 8, 8, spp=1, seed=1))
    assert film.shape == (8, 8, 3)

    img = pt.render("nodof", scene, 8, 8, spp=4, seed=1)
    assert img.shape == (8, 8, 4) and img.dtype == np.uint8

    film = pt.render("simplecpu", None, 8, 8, spp=1, seed=1)
    assert film.shape == (8, 8, 3)


def test_render_rgba8_and_errors():
    scene = small_scene()
    img = pt.render("super", scene, 8, 8, spp=1, seed=1, as_rgba8=True)
    assert img.shape == (8, 8, 4) and img.dtype == np.uint8
    with pytest.raises(ValueError):
        pt.render("nope", scene)
    with pytest.raises(ValueError):
        pt.render("nodof", scene, spp=5)


def test_metrics():
    from opencl_montecarlo_path_tracing_tpu.utils.metrics import (
        rmse, correlation, psnr, spp_to_rmse,
    )
    a = np.zeros((4, 4))
    b = np.ones((4, 4))
    assert rmse(a, b) == 1.0
    assert psnr(a, a) == float("inf")
    assert abs(correlation(np.arange(16.0), np.arange(16.0)) - 1.0) < 1e-12
    spp, hist = spp_to_rmse(lambda s: b / s, a, target=0.26,
                            spp_schedule=(1, 2, 4))
    assert spp == 4 and len(hist) == 3
