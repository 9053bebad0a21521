"""Common-random-numbers oracle agreement: estimator bias < 1e-3, PROVEN.

The NumPy oracles consume the SAME threefry streams as the JAX integrators
(oracle ``key=`` mode), so every sample is identical and the comparison
isolates estimator bias from Monte-Carlo noise.  The BASELINE.json quality
criterion is RMSE < 1e-3 on the display scale ((film/spp * 64) / 255 around
the ambient term); with common random numbers the agreement is float-
rounding-level (measured ~6e-8 max) at ANY spp - asserted here at 1e-5 to
leave margin for BLAS/XLA reassociation across platforms.

Oracles cite: SimpleCPUTracer/simpleCPUtracer.cpp:50-119 (simple),
CLSuperPathTracer/pathtracer.ocl:48-241 (super),
CLSuperBidirectionalPathTracer/bidirectionalpathtracer.ocl:230-365 (BPT).
"""

import numpy as np

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.core.quirks import Quirks
from opencl_montecarlo_path_tracing_tpu.models.simple import render_simple
from opencl_montecarlo_path_tracing_tpu.models.oracle import render_oracle
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.models.oracle_super import (
    render_oracle_super)
from opencl_montecarlo_path_tracing_tpu.models.bidirectional import (
    render_bidirectional)
from opencl_montecarlo_path_tracing_tpu.models.oracle_bpt import (
    render_oracle_bpt)
from tests.test_render_super import small_scene


def display_diff(jax_film, oracle_film, spp):
    """Max per-pixel difference on the BASELINE display scale."""
    d = np.abs(np.asarray(jax_film) - oracle_film)
    return float((d / spp * 64.0 / 255.0).max())


def test_super_matches_oracle_bitwise_crn():
    scene = small_scene()
    key = make_key(7)
    spp = 4
    jx = render_super(key, scene, 16, 16, spp=spp)
    orc = render_oracle_super(scene, 16, 16, spp=spp, key=key)
    assert display_diff(jx, orc, spp) < 1e-5


def test_super_crn_reference_quirks():
    scene = small_scene()
    key = make_key(8)
    q = Quirks.reference()
    spp = 2
    jx = render_super(key, scene, 16, 16, spp=spp, quirks=q)
    orc = render_oracle_super(scene, 16, 16, spp=spp, key=key, quirks=q)
    assert display_diff(jx, orc, spp) < 1e-5


def test_simple_matches_oracle_bitwise_crn():
    key = make_key(9)
    spp = 4
    jx = render_simple(key, 16, 16, spp=spp, max_bounces=5)
    orc = render_oracle(16, 16, spp=spp, key=key, max_depth=5)
    assert display_diff(jx, orc, spp) < 1e-5


def test_bidirectional_matches_oracle_bitwise_crn():
    scene = small_scene()
    key = make_key(10)
    spp = 2
    jx = render_bidirectional(key, scene, 16, 16, spp=spp, n_vlp=32)
    orc = render_oracle_bpt(scene, 16, 16, spp=spp, n_vlp=32, key=key)
    assert display_diff(jx, orc, spp) < 1e-5


def test_crn_spp_window_composition():
    """CRN + spp windows: two half-renders of the oracle's sample space sum
    to the full JAX render (pins that ray ids, not draw order, define the
    sample content)."""
    scene = small_scene()
    key = make_key(11)
    a = np.asarray(render_super(key, scene, 8, 8, spp=2, spp_offset=0,
                                spp_total=4))
    b = np.asarray(render_super(key, scene, 8, 8, spp=2, spp_offset=2,
                                spp_total=4))
    orc = render_oracle_super(scene, 8, 8, spp=4, key=key)
    assert display_diff(a + b, orc, 4) < 1e-5
