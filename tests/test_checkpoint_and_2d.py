import numpy as np

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
    make_mesh_2d, render_super_sharded_2d,
)
from opencl_montecarlo_path_tracing_tpu.utils.checkpoint import (
    FilmCheckpoint, render_resumable,
)
from tests.test_render_super import small_scene


def test_checkpoint_resume_matches_single_render(tmp_path):
    key = make_key(55)
    scene = small_scene()
    w = h = 12
    spp = 8
    path = str(tmp_path / "film.npz")

    # run two windows, "crash", resume from the checkpoint
    ck = render_resumable(render_super, key, scene, w, h, spp,
                          checkpoint_path=path, spp_per_step=3, seed=7)
    assert ck.spp_done == spp
    # re-entering with a completed checkpoint is a no-op
    ck2 = render_resumable(render_super, key, scene, w, h, spp,
                           checkpoint_path=path, spp_per_step=3, seed=7)
    np.testing.assert_array_equal(ck.film, ck2.film)

    single = np.asarray(render_super(key, scene, w, h, spp=spp))
    np.testing.assert_allclose(ck.film, single, rtol=0, atol=2e-3)

    back = FilmCheckpoint.load(path)
    assert back.spp_done == spp and back.seed == 7
    np.testing.assert_array_equal(back.film, ck.film)


def test_crash_mid_render_then_resume(tmp_path):
    """Simulated crash after the first window; the resumed render completes
    to exactly the single-shot result."""
    key = make_key(56)
    scene = small_scene()
    path = str(tmp_path / "film.npz")

    calls = {"n": 0}

    def crashing_render(*args, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("boom")
        calls["n"] += 1
        return render_super(*args, **kw)

    try:
        render_resumable(crashing_render, key, scene, 8, 8, 8,
                         checkpoint_path=path, spp_per_step=4, seed=1)
    except RuntimeError:
        pass
    mid = FilmCheckpoint.load(path)
    assert mid.spp_done == 4 and mid.spp_total == 8

    ck = render_resumable(render_super, key, scene, 8, 8, 8,
                          checkpoint_path=path, spp_per_step=4, seed=1)
    single = np.asarray(render_super(key, scene, 8, 8, spp=8))
    np.testing.assert_allclose(ck.film, single, rtol=0, atol=2e-3)


def test_sharded_checkpoint_resume(tmp_path):
    """--checkpoint composed with --shard (round-5): a sharded render
    accumulated in checkpointed spp windows, interrupted and resumed, is
    bit-identical to the same sharded windows run uninterrupted, and
    matches both the direct sharded render and the unsharded resumable
    render up to summation order."""
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        make_spp_mesh, render_super_sharded,
    )
    key = make_key(58)
    scene = small_scene()
    w = h = 12
    spp = 8
    mesh = make_spp_mesh(2)

    def win(k, s_, ww, hh, spp, spp_offset, spp_total):
        return render_super_sharded(k, s_, ww, hh, spp, mesh,
                                    spp_offset=spp_offset,
                                    spp_total=spp_total)

    path = str(tmp_path / "film.npz")
    calls = {"n": 0}

    def crashing(*a, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("boom")
        calls["n"] += 1
        return win(*a, **kw)

    try:
        render_resumable(crashing, key, scene, w, h, spp,
                         checkpoint_path=path, spp_per_step=4, seed=9)
    except RuntimeError:
        pass
    assert FilmCheckpoint.load(path).spp_done == 4
    ck = render_resumable(win, key, scene, w, h, spp,
                          checkpoint_path=path, spp_per_step=4, seed=9)
    assert ck.spp_done == spp

    uninterrupted = render_resumable(win, key, scene, w, h, spp,
                                     spp_per_step=4, seed=9)
    np.testing.assert_array_equal(ck.film, uninterrupted.film)

    direct = np.asarray(render_super_sharded(key, scene, w, h, spp, mesh))
    np.testing.assert_allclose(ck.film, direct, rtol=0, atol=2e-3)

    unsharded = render_resumable(render_super, key, scene, w, h, spp,
                                 spp_per_step=4, seed=9)
    np.testing.assert_allclose(ck.film, unsharded.film, rtol=0, atol=2e-3)


def test_sharded_window_offset_matches_unsharded_window():
    """A (spp_offset, spp_total) window through the sharded renderer draws
    exactly the same logical samples as the unsharded window (counter-based
    RNG keyed on pixel*spp_total+sample, core/rng.py)."""
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        make_spp_mesh, render_super_sharded,
    )
    key = make_key(59)
    scene = small_scene()
    mesh = make_spp_mesh(2)
    sharded = np.asarray(render_super_sharded(
        key, scene, 12, 12, 4, mesh, spp_offset=4, spp_total=12))
    single = np.asarray(render_super(key, scene, 12, 12, spp=4,
                                     spp_offset=4, spp_total=12))
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)


def test_2d_mesh_matches_single_device():
    key = make_key(57)
    scene = small_scene()
    w, h, spp = 8, 16, 4
    mesh = make_mesh_2d(4, 2)  # 4-way rows x 2-way spp on the 8 CPU devices
    sharded = np.asarray(render_super_sharded_2d(key, scene, w, h, spp, mesh))
    single = np.asarray(render_super(key, scene, w, h, spp=spp))
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, rtol=0, atol=2e-3)
