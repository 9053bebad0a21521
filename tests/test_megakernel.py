"""The Pallas megakernel == the XLA wavefront pipeline, to float rounding.

film_super_mega (ops/pallas_super.py) re-implements the whole sample step
(threefry draws, camera, primitive scan, shadow rays, shading, spp
accumulation) as one kernel; these tests pin it against film_super on the
full reference scene, in interpret mode on the CPU mesh."""

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.core.quirks import (
    DEFAULT, REFERENCE, REFERENCE_LMEM)
from opencl_montecarlo_path_tracing_tpu.models.super import film_super
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tests.test_render_super import small_scene

ATOL = 2e-5


def ref_film(key, scn, w, h, spp, quirks=DEFAULT, **kw):
    return np.asarray(jax.jit(
        lambda k: film_super(k, scn, w, h, spp,
                             kw.get("spp_offset", 0),
                             kw.get("spp_total", spp), quirks,
                             row_offset=kw.get("row_offset", 0),
                             rows=kw.get("rows")))(key))


def mega_film(key, scn, w, h, spp, quirks=DEFAULT, **kw):
    return np.asarray(M.film_super_mega(key, scn, w, h, spp, quirks=quirks,
                                        interpret=True, **kw))


def test_megakernel_matches_xla_default():
    scn = prep_scene(small_scene())
    key = make_key(3)
    a = ref_film(key, scn, 40, 12, 2)
    b = mega_film(key, scn, 40, 12, 2)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_matches_xla_reference_quirks():
    scn = prep_scene(small_scene())
    key = make_key(4)
    a = ref_film(key, scn, 16, 16, 2, quirks=REFERENCE)
    b = mega_film(key, scn, 16, 16, 2, quirks=REFERENCE)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_odd_size_padding():
    """33x17 exercises the partial last tile."""
    scn = prep_scene(small_scene())
    key = make_key(5)
    a = ref_film(key, scn, 33, 17, 2)
    b = mega_film(key, scn, 33, 17, 2)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_spp_window_and_rows():
    """The sharded renderers' parameters (spp window + row band) reach the
    kernel as SMEM scalars; content must equal the XLA band."""
    scn = prep_scene(small_scene())
    key = make_key(6)
    kw = dict(spp_offset=2, spp_total=6, row_offset=4, rows=4)
    a = ref_film(key, scn, 16, 16, 2, **kw)
    b = mega_film(key, scn, 16, 16, 2, **kw)
    assert b.shape == (4, 16, 3)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_gate():
    scn = prep_scene(small_scene())
    assert M.supported(scn, DEFAULT, None, None, 5)
    assert M.supported(scn, REFERENCE, None, None, 5)
    assert not M.supported(scn, REFERENCE_LMEM, None, None, 5)
    assert not M.supported(scn, DEFAULT, lambda *a: None, None, 5)
    assert not M.supported(scn, DEFAULT, None, lambda *a: None, 5)
