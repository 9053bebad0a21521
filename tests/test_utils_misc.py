import os

import numpy as np
import pytest

from opencl_montecarlo_path_tracing_tpu.utils.profiling import StageTimer
from opencl_montecarlo_path_tracing_tpu.utils.checkpoint import (
    FilmCheckpoint, render_resumable,
)


def test_stage_timer_report_format():
    t = StageTimer()
    t.record("rendering", 12.5, items=262144, item_label="pixels",
             data_size=1048576)
    t.record("read render data", 2.0, items=1048576, item_label="uchar",
             data_size=1048576)
    rep = t.report()
    # the reference's line shape: "<name> : <N> <label> in <ms>ms: <gbs> GB/s"
    assert "rendering : 262144 pixels in 12.5ms:" in rep
    assert "GB/s" in rep
    assert "Total time: 14.5 ms." in rep


def test_stage_timer_run_blocks_and_records():
    import jax.numpy as jnp
    t = StageTimer()
    out = t.run("stage", lambda: jnp.arange(16).sum(), items=16,
                item_label="ints", data_size=64)
    assert int(out) == 120
    assert t.stages[0].ms >= 0


def test_profiler_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp
    t = StageTimer()
    with t.trace(str(tmp_path)):
        jax.block_until_ready(jnp.arange(128.0) * 2)
    # the profiler writes a plugins/profile tree
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no profiler output written"


def test_checkpoint_incompatible_restarts(tmp_path):
    from opencl_montecarlo_path_tracing_tpu.models.super import render_super
    from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
    from tests.test_render_super import small_scene
    path = str(tmp_path / "f.npz")
    scene = small_scene()
    key = make_key(9)
    render_resumable(render_super, key, scene, 8, 8, 4,
                     checkpoint_path=path, spp_per_step=4, seed=1)
    # different seed -> incompatible -> starts over rather than resuming
    ck = render_resumable(render_super, key, scene, 8, 8, 4,
                          checkpoint_path=path, spp_per_step=4, seed=2)
    assert ck.seed == 2 and ck.spp_done == 4
    # different shape -> incompatible
    ck = render_resumable(render_super, key, scene, 8, 12, 4,
                          checkpoint_path=path, spp_per_step=4, seed=2)
    assert ck.film.shape == (12, 8, 3)


def test_multihost_initialize_is_safe_single_process():
    from opencl_montecarlo_path_tracing_tpu.parallel import multihost
    multihost.initialize()  # no-op / swallowed in single-process envs
    assert multihost.is_primary() in (True, False)
