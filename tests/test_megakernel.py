"""The Pallas megakernel == the XLA wavefront pipeline, to float rounding.

film_super_mega (ops/pallas_super.py) re-implements the whole sample step
(threefry draws, camera, primitive scan, shadow rays, shading, spp
accumulation) as one kernel; these tests pin it against film_super on the
full reference scene, in interpret mode on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

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
    """Sky window (trace must produce no false hits) AND a floor band
    at CONTENT_ROW (shadow + shading terms live - a small window at the
    origin is all sky, round-2 finding)."""
    scn = prep_scene(small_scene())
    key = make_key(3)
    a = ref_film(key, scn, 40, 12, 2)
    b = mega_film(key, scn, 40, 12, 2)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    kw = dict(row_offset=300, rows=8)
    a = ref_film(key, scn, 40, 308, 2, **kw)
    b = mega_film(key, scn, 40, 308, 2, **kw)
    assert np.asarray(a).var() > 1e-5   # content (floor checker + shadows)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_matches_xla_reference_quirks():
    scn = prep_scene(small_scene())
    key = make_key(4)
    kw = dict(row_offset=300, rows=8)
    a = ref_film(key, scn, 16, 308, 2, quirks=REFERENCE, **kw)
    b = mega_film(key, scn, 16, 308, 2, quirks=REFERENCE, **kw)
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


def test_megakernel_spp_group_and_tail():
    """spp >= the tier's group size runs the grouped loop (samples
    stacked along sublanes, sharing each triangle-table pass) plus a
    static tail for the remainder; the film must equal the XLA pipeline
    for both (content band).  The production SMEM tier runs G=1 (the
    round-3 sweep - vreg pressure), so pin the generic G>1 stacked
    machinery by patching the constant (the blocked tier ships G=2
    through the same sample_group_body)."""
    scn = prep_scene(small_scene())
    key = make_key(19)
    kw = dict(row_offset=300, rows=8)
    prev = M._SPP_GROUP
    M._SPP_GROUP = 4
    try:
        for spp in (M._SPP_GROUP, M._SPP_GROUP + 1):
            a = ref_film(key, scn, 24, 308, spp, **kw)
            b = mega_film(key, scn, 24, 308, spp, **kw)
            np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    finally:
        M._SPP_GROUP = prev


def test_megakernel_gate():
    scn = prep_scene(small_scene())
    assert M.supported(scn, DEFAULT, None, None, 5)
    assert M.supported(scn, REFERENCE, None, None, 5)
    assert M.supported(scn, REFERENCE_LMEM, None, None, 5)  # carry-t: covered
    assert not M.supported(scn, DEFAULT, lambda *a: None, None, 5)
    assert not M.supported(scn, DEFAULT, None, lambda *a: None, 5)


def test_megakernel_carry_t_quirk():
    """The _lmem binaries' `&t` shadow aliasing (lmem ocl:178): the
    megakernel's sequential seeded traces must equal the XLA carry
    branch (models/super.py::illum_direct).  The scene puts a sphere
    wall BEYOND the primary-hit distance on the shadow path (floor at
    t ~ 91 from the camera, occluders at 150 toward a z=300 light), so
    the carried t actually changes occlusions - asserted against the
    plain-quirks render."""
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scene = Scene(
        sphere_centers=np.array([[20 + i, -75.0, 150.0] for i in range(10)],
                                np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=np.zeros((0, 3, 3), np.float32),
        lights=np.array([[25.0, -75.0, 300.0, 400.0]], np.float32))
    scn = prep_scene(scene)
    key = make_key(18)
    kw = dict(row_offset=CONTENT_ROW, rows=12)
    a = ref_film(key, scn, 40, CONTENT_ROW + 12, 2, quirks=REFERENCE_LMEM,
                 **kw)
    b = mega_film(key, scn, 40, CONTENT_ROW + 12, 2, quirks=REFERENCE_LMEM,
                  **kw)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    # the quirk changes occlusions here (occluders beyond the carry)
    c = ref_film(key, scn, 40, CONTENT_ROW + 12, 2, quirks=REFERENCE, **kw)
    assert np.abs(a - c).max() > 1e-4


def test_megakernel_blocked_matches_smem():
    """The Morton-blocked DMA-streamed triangle scan (large meshes) must
    render the same film as the SMEM-resident scan: conservative AABB
    skips never change the result."""
    scn = prep_scene(small_scene())
    key = make_key(12)
    a = np.asarray(M.film_super_mega(key, scn, 40, 12, 2, quirks=DEFAULT,
                                     interpret=True, force_blocked=False))
    b = np.asarray(M.film_super_mega(key, scn, 40, 12, 2, quirks=DEFAULT,
                                     interpret=True, force_blocked=True))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_blocked_grouped_and_tail():
    """spp >= _SPP_GROUP engages the blocked spp group (shared union
    take-lists for primaries and shadows); spp=5 also covers the tail
    sample.  Content band so shadows/shading are live."""
    scn = prep_scene(small_scene())
    key = make_key(17)
    kw = dict(row_offset=300, rows=8)
    a = ref_film(key, scn, 40, 308, 5, **kw)
    b = np.asarray(M.film_super_mega(key, scn, 40, 308, 5, quirks=DEFAULT,
                                     interpret=True, force_blocked=True,
                                     **kw))
    assert np.asarray(a).var() > 1e-5
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_blocked_reference_quirks():
    """neg_t quirk mode disables the eps/t prunes; results still match."""
    scn = prep_scene(small_scene())
    key = make_key(13)
    a = ref_film(key, scn, 16, 16, 2, quirks=REFERENCE)
    b = np.asarray(M.film_super_mega(key, scn, 16, 16, 2, quirks=REFERENCE,
                                     interpret=True, force_blocked=True))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_blocked_interval_gated_path():
    """Meshes with more than 2 interval groups take the GATED prepass
    (vector interval-frustum flags gating the exact per-block tests and
    the take-list walk behind pl.when) - small scenes fall back to the
    flat prepass, so shrink the block/group constants to drive the gate
    with an interpret-sized mesh, and pin equality against the XLA
    pipeline on a window that sees the mesh (120-triangle torus placed
    on the (20, 150) view ray; the fixed-frame top-left window is
    otherwise all sky)."""
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(center=(17.959, 4.252, 10.25),
                             n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200]], np.float32),
    ))
    key = make_key(23)
    kw = dict(row_offset=150, rows=8)
    prev = M._TRI_BLOCK, M._MACRO, M._IGRP
    M._TRI_BLOCK, M._MACRO, M._IGRP = 8, 2, 2  # 120 tris -> 16 blocks,
    try:                                       # 8 interval groups
        tblT, aabbs, aabbs_m = M._tri_blocks(scn)
        assert aabbs.shape[0] > 2 * M._IGRP   # gate actually engaged
        a = ref_film(key, scn, 40, 158, 2, **kw)
        b = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                         quirks=DEFAULT, interpret=True,
                                         force_blocked=True, **kw))
    finally:
        M._TRI_BLOCK, M._MACRO, M._IGRP = prev
    assert np.asarray(a).var() > 1e-5   # mesh visible, not vacuous
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_megakernel_blocked_random_soup():
    """Gated-path equality on RANDOM geometry: a soup of random
    triangles (plus zero-area slivers and flat axis-aligned ones, whose
    blocks have zero-extent AABBs) in the content band - adversarial
    input for the interval arithmetic that the structured torus meshes
    cannot produce."""
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    rng = np.random.default_rng(31)
    c = np.array([17.959, 4.252, 10.25], np.float32)
    n = 96
    base = (c + rng.uniform(-1.2, 1.2, (n, 1, 3))).astype(np.float32)
    tris = base + rng.uniform(-0.35, 0.35, (n, 3, 3)).astype(np.float32)
    tris[:8, 2] = tris[:8, 1]            # zero-area slivers (det == 0)
    for ax in range(3):                  # flat axis-aligned triangles:
        tris[8 + ax::12, :, ax] = tris[8 + ax::12, :1, ax]  # 0-extent AABB
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=tris,
        lights=np.array([[10, 4, 10, 200]], np.float32),
    ))
    key = make_key(37)
    kw = dict(row_offset=150, rows=8)
    prev = M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP
    M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = 8, 2, 4, 2  # 96 tris ->
    try:                                   # 12 blocks, 6 interval groups
        a = ref_film(key, scn, 40, 158, 2, **kw)
        b = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                         quirks=DEFAULT, interpret=True,
                                         force_blocked=True, **kw))
        # stream tier on the same soup: the SIGN-SPLIT interval gate is
        # the only culling (zero-extent AABBs + slivers stress its
        # interval arithmetic), across 3 segments
        s = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                         quirks=DEFAULT, interpret=True,
                                         force_stream=True, **kw))
    finally:
        M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = prev
    assert np.asarray(a).var() > 1e-5   # soup visible, not vacuous
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    np.testing.assert_allclose(s, a, rtol=0, atol=ATOL)


def test_megakernel_blocked_segmented_scan():
    """Meshes with more than _SEG blocks scan in SEGMENTS, re-running
    the flag prepass between segments with the t/occ carries the
    previous segments established (near-to-far macro order makes the
    re-prune effective; conservative tests keep it exact).  Shrink the
    block/macro/segment constants so an interpret-sized torus spans 4
    segments, and pin equality against the XLA pipeline on a window
    that sees the mesh (both spp=2 - the grouped-multi path - and
    spp=%d via the grouped union take-lists, one group plus a
    tail sample).""" % (M._SPP_GROUP_BLOCKED + 1,)
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(center=(17.959, 4.252, 10.25),
                             n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200]], np.float32),
    ))
    key = make_key(29)
    kw = dict(row_offset=150, rows=8)
    prev = M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP
    # igrp=2: segment bounds (multiples of 4) stay group-aligned;
    # igrp=3: segments START MID-GROUP, covering the chunked walks
    for igrp in (2, 3):
        M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = 8, 2, 4, igrp
        try:
            assert -(-120 // M._TRI_BLOCK) > M._SEG  # multi-segment
            a = ref_film(key, scn, 40, 158, 2, **kw)
            b = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                             quirks=DEFAULT,
                                             interpret=True,
                                             force_blocked=True, **kw))
            gspp = M._SPP_GROUP_BLOCKED + 1
            g = np.asarray(M.film_super_mega(key, scn, 40, 158,
                                             gspp, quirks=DEFAULT,
                                             interpret=True,
                                             force_blocked=True, **kw))
            ag = ref_film(key, scn, 40, 158, gspp, **kw)
        finally:
            M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = prev
        assert np.asarray(a).var() > 1e-5   # mesh visible, not vacuous
        np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
        np.testing.assert_allclose(g, ag, rtol=0, atol=ATOL)


def test_megakernel_stream_tier():
    """Meshes past _MAX_BLOCKED_TRIANGLES run the STREAM tier: take-lists
    come from the segment-sliced interval gate trimmed by the DMA-chunked
    exact per-lane refinement (no mesh-sized SMEM tables; gate and
    refined flags are both supersets of the blocks the sequential scan
    could hit, so culling can only scan MORE blocks, never fewer).
    Shrink the constants so an interpret-sized torus spans 4 segments;
    pin equality against the XLA pipeline for the single-sample path
    (spp=2), the grouped union path (one group + tail) and the carry-t
    quirk's sequential seeded traces - and pin the gate-only path
    (_STREAM_REFINE off) bit-identical to the refined one (the
    refinement is pure culling)."""
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(center=(17.959, 4.252, 10.25),
                             n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200]], np.float32),
    ))
    key = make_key(41)
    kw = dict(row_offset=150, rows=8)
    prev = M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP
    M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = 8, 2, 4, 2
    try:
        assert -(-120 // M._TRI_BLOCK) > M._SEG   # multi-segment
        a = ref_film(key, scn, 40, 158, 2, **kw)
        b = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                         quirks=DEFAULT, interpret=True,
                                         force_stream=True, **kw))
        gspp = M._SPP_GROUP_BLOCKED + 1
        g = np.asarray(M.film_super_mega(key, scn, 40, 158, gspp,
                                         quirks=DEFAULT, interpret=True,
                                         force_stream=True, **kw))
        ag = ref_film(key, scn, 40, 158, gspp, **kw)
        c = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                         quirks=REFERENCE_LMEM,
                                         interpret=True,
                                         force_stream=True, **kw))
        ac = ref_film(key, scn, 40, 158, 2, quirks=REFERENCE_LMEM, **kw)
        M._STREAM_REFINE = False
        try:
            u = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                             quirks=DEFAULT, interpret=True,
                                             force_stream=True, **kw))
        finally:
            M._STREAM_REFINE = True
    finally:
        M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = prev
    assert np.asarray(a).var() > 1e-5   # mesh visible, not vacuous
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    np.testing.assert_allclose(g, ag, rtol=0, atol=ATOL)
    np.testing.assert_allclose(c, ac, rtol=0, atol=ATOL)
    np.testing.assert_array_equal(u, b)   # refinement is pure culling


def test_stream_gate_table_nan_sentinels():
    """The stream gate table's phantom columns - lane padding to cpad
    AND the final segment's tail when n_blocks % _SEG != 0 - must be
    NaN, not inverted (+big, -big) boxes: the interval slab computes
    [min, max] over the two plane candidates, so an INVERTED box is
    ALWAYS-HIT while NaN fails every sign-constrained test.  With the
    old +-3e38 fill, any fori-run stream mesh with n_blocks % _SEG != 0
    set gate bits on phantom blocks past tblT's extent (advisor
    finding, round 3)."""
    rng = np.random.default_rng(11)
    igrp = M._IGRP
    nb = 5 * igrp                      # 5 real groups
    aabbs = np.empty((nb, 6), np.float32)
    lo = rng.uniform(-5, 5, (nb, 3)).astype(np.float32)
    aabbs[:, :3] = lo
    aabbs[:, 3:] = lo + rng.uniform(0.1, 2, (nb, 3)).astype(np.float32)
    aiv = M._aabb_interval_rows(aabbs)
    n_seg, cols = 3, 2                 # 6 column slots for 5 real groups
    aiv3 = M._stream_gate_table(aiv, nb, n_seg, cols, cpad=128)
    assert aiv3.shape == (n_seg, 6 * igrp, 128)
    # real columns intact
    np.testing.assert_array_equal(aiv3[0, :, :cols], aiv[:, 0:2])
    np.testing.assert_array_equal(aiv3[2, :, :1], aiv[:, 4:5])
    # every phantom slot (tail column of the last segment + lane pad) NaN
    assert np.isnan(aiv3[2, :, 1:]).all()
    assert np.isnan(aiv3[:, :, cols:]).all()

    # semantic pin: a sign-constrained bundle hits the real boxes but
    # NEVER a NaN box, while the inverted fill passes as always-hit
    def hit_row(comp6):
        comp = tuple(np.broadcast_to(np.float32(v), (igrp, 1))
                     for v in comp6)
        o = tuple(np.zeros((8, 128), np.float32) + np.float32(c)
                  for c in (0.0, 0.0, 0.0))
        d = tuple(np.full((8, 128), np.float32(c))
                  for c in (1.0, 0.5, 0.25))   # strictly signed
        return np.asarray(M._interval_test(comp, o, d, None, None,
                                           None, False))
    assert not hit_row([np.nan] * 6).any()
    assert hit_row([np.float32(3e38)] * 3 + [np.float32(-3e38)] * 3).all()
    assert hit_row([1.0, 0.5, 0.25, 2.0, 1.0, 0.5]).all()  # on-axis box


def test_megakernel_stream_tail_segment():
    """n_blocks % _SEG != 0: the fori segment loop runs the FINAL
    segment with bn = _SEG, so its tail holds phantom blocks.  NaN gate
    sentinels + the take-list's id < n_blocks count guard must keep
    them out of the scan.  120 tris at block 8 -> 16 blocks, _SEG=6 ->
    segments (6, 6, 4+2 phantom); pin both the refined and gate-only
    paths against the XLA pipeline."""
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(center=(17.959, 4.252, 10.25),
                             n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200]], np.float32),
    ))
    key = make_key(61)
    kw = dict(row_offset=150, rows=8)
    prev = M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP
    M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = 8, 2, 6, 2
    try:
        nb = -(-120 // M._TRI_BLOCK)
        nb = -(-nb // M._MACRO) * M._MACRO
        assert nb > M._SEG and nb % M._SEG != 0   # phantom tail active
        a = ref_film(key, scn, 40, 158, 2, **kw)
        b = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                         quirks=DEFAULT, interpret=True,
                                         force_stream=True, **kw))
        M._STREAM_REFINE = False
        try:
            u = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                             quirks=DEFAULT, interpret=True,
                                             force_stream=True, **kw))
        finally:
            M._STREAM_REFINE = True
    finally:
        M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = prev
    assert np.asarray(a).var() > 1e-5   # mesh visible, not vacuous
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    np.testing.assert_array_equal(u, b)   # refinement is pure culling


def test_megakernel_blocked_stream_two_lights():
    """Shared shadow-ray scans with MORE THAN ONE light: each sample
    contributes one occlusion bundle PER LIGHT to the union take-list
    (blocked tier) / sign-split interval gate (stream tier), a
    composition the single-light torus tests never execute.  Pin both
    tiers against the XLA pipeline on a 2-light torus across segments,
    for the single-sample and grouped paths (reference lights
    CLSuperPathTracer/lights.txt: (10,4,10)*200 and (15,2,7)*150)."""
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(center=(17.959, 4.252, 10.25),
                             n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200], [15, 2, 7, 150]], np.float32),
    ))
    key = make_key(53)
    kw = dict(row_offset=150, rows=8)
    prev = M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP
    M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = 8, 2, 4, 2
    try:
        assert -(-120 // M._TRI_BLOCK) > M._SEG   # multi-segment
        a = ref_film(key, scn, 40, 158, 2, **kw)
        gspp = M._SPP_GROUP_BLOCKED + 1
        ag = ref_film(key, scn, 40, 158, gspp, **kw)
        for force in ("force_blocked", "force_stream"):
            b = np.asarray(M.film_super_mega(key, scn, 40, 158, 2,
                                             quirks=DEFAULT, interpret=True,
                                             **{force: True}, **kw))
            g = np.asarray(M.film_super_mega(key, scn, 40, 158,
                                             gspp, quirks=DEFAULT,
                                             interpret=True,
                                             **{force: True}, **kw))
            np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
            np.testing.assert_allclose(g, ag, rtol=0, atol=ATOL)
    finally:
        M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = prev
    assert np.asarray(a).var() > 1e-5   # mesh visible, not vacuous


def test_stream_gate_sizes():
    """The size switch: <= 512 SMEM, <= 65536 exact-blocked, <= 1M
    stream, beyond unsupported."""
    scn = prep_scene(small_scene())
    assert M._MAX_STREAM_TRIANGLES == 1 << 20
    assert M.supported(scn, DEFAULT, None, None, 5)


def test_tri_blocks_structure():
    """Morton blocks: a permutation of the triangle table with original
    indices in row 12, conservative AABBs containing every member
    triangle's vertices (padding columns carry index 2^24); every macro
    AABB encloses its _MACRO member block AABBs."""
    scn = prep_scene(small_scene())
    from opencl_montecarlo_path_tracing_tpu.ops.intersect import _tri_table
    tblT, aabbs, aabbs_m = M._tri_blocks(scn)
    assert aabbs.shape[0] == aabbs_m.shape[0] * M._MACRO
    for m in range(aabbs_m.shape[0]):
        grp = aabbs[m * M._MACRO:(m + 1) * M._MACRO]
        nonempty = grp[:, 0] <= grp[:, 3]
        if nonempty.any():
            assert (aabbs_m[m, :3] <= grp[nonempty, :3] + 1e-6).all()
            assert (aabbs_m[m, 3:] >= grp[nonempty, 3:] - 1e-6).all()
        else:
            assert aabbs_m[m, 0] > aabbs_m[m, 3]
    nt = scn.tri_v0.shape[0]
    orig = _tri_table(scn)
    real = tblT[12] < 2 ** 24
    assert int(real.sum()) == nt
    idx = tblT[12, real].astype(int)
    assert sorted(idx) == list(range(nt))
    # row 12's index maps each column back to its original table row
    np.testing.assert_array_equal(tblT[:12, real].T, orig[idx])
    for bi in range(aabbs.shape[0]):
        cols = np.arange(bi * M._TRI_BLOCK, (bi + 1) * M._TRI_BLOCK)
        cols = cols[real[cols]]
        if cols.size == 0:
            # padding block: NaN box (fails every slab/interval test;
            # an inverted box would PASS the interval forms)
            assert np.isnan(aabbs[bi]).all()
            continue
        rows = tblT[:12, cols].T
        v0 = rows[:, 0:3]
        for v in (v0, v0 + rows[:, 3:6], v0 + rows[:, 6:9]):
            assert (v >= aabbs[bi, :3] - 1e-5).all()
            assert (v <= aabbs[bi, 3:] + 1e-5).all()


def test_aabb_interval_rows_layout():
    """The lane-major interval table puts component c of block
    g*_IGRP+u at [c*_IGRP + u, g]; lanes past the last group (and rows
    past the last block) carry empty never-hit boxes."""
    rng = np.random.default_rng(7)
    for nb in (1, M._IGRP, M._IGRP + 3, 5 * M._IGRP - 1):
        lo = rng.uniform(-10, 10, (nb, 3)).astype(np.float32)
        hi = lo + rng.uniform(0.1, 5, (nb, 3)).astype(np.float32)
        aabbs = np.concatenate([lo, hi], axis=1)
        out = M._aabb_interval_rows(aabbs)
        ng = -(-nb // M._IGRP)
        assert out.shape[0] == 6 * M._IGRP
        assert out.shape[1] % 128 == 0 and out.shape[1] >= ng
        for b in range(nb):
            g, u = b // M._IGRP, b % M._IGRP
            for c in range(6):
                assert out[c * M._IGRP + u, g] == aabbs[b, c]
        # every padding slot is an inverted (never-hit) box
        mask = np.zeros((M._IGRP, out.shape[1]), bool)
        for b in range(nb):
            mask[b % M._IGRP, b // M._IGRP] = True
        for c in range(3):
            plo = out[c * M._IGRP:(c + 1) * M._IGRP]
            phi = out[(c + 3) * M._IGRP:(c + 4) * M._IGRP]
            assert (plo[~mask] > phi[~mask]).all()


def test_group_chunks_cover_range():
    """_group_chunks partitions [b0, b0+bn) exactly into within-group
    spans, in order, for aligned and mid-group segment starts."""
    for igrp in (2, 3, 8):
        prev = M._IGRP
        M._IGRP = igrp
        try:
            for b0, bn in ((0, 1), (0, igrp), (1, igrp), (igrp - 1, 1),
                           (igrp - 1, igrp + 2), (2 * igrp + 1, 3 * igrp),
                           (0, 4 * igrp), (3, 2 * igrp - 1)):
                chunks = M._group_chunks(b0, bn)
                blocks = []
                for grp, u0, u1 in chunks:
                    assert 0 <= u0 < u1 <= igrp
                    blocks.extend(grp * igrp + u for u in range(u0, u1))
                assert blocks == list(range(b0, b0 + bn))
        finally:
            M._IGRP = prev


# --- simple megakernel (ops/pallas_simple.py): multi-bounce mirrors ---

from opencl_montecarlo_path_tracing_tpu.models.simple import render_simple  # noqa: E402
from opencl_montecarlo_path_tracing_tpu.ops import pallas_simple as SM  # noqa: E402
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene as _prep  # noqa: E402
from opencl_montecarlo_path_tracing_tpu.scene.scene import simple_scene  # noqa: E402


def test_simple_megakernel_matches_xla():
    key = make_key(20)
    scn = _prep(simple_scene())
    a = np.asarray(render_simple(key, 40, 12, spp=2))  # CPU -> XLA path
    b = np.asarray(SM.film_simple_mega(key, scn, 40, 12, 2, quirks=DEFAULT,
                                       interpret=True))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_simple_megakernel_reference_quirks_and_window():
    """Specular divFact-multiply quirk + spp window/row band."""
    key = make_key(21)
    scn = _prep(simple_scene())
    a = np.asarray(render_simple(key, 16, 16, spp=2, spp_offset=1,
                                 spp_total=4, quirks=REFERENCE))[4:8]
    b = np.asarray(SM.film_simple_mega(key, scn, 16, 16, 2, spp_offset=1,
                                       spp_total=4, quirks=REFERENCE,
                                       row_offset=4, rows=4,
                                       interpret=True))
    assert b.shape == (4, 16, 3)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_simple_megakernel_spp_group_and_tail():
    """spp >= the group size runs the lockstep-grouped bounce loops plus
    a tail; spp=1 pins the single-sample path on the sphere-field band
    (tie-aware quantile - silhouette samples can flip between fused and
    plain f32, see test_crn.py).  spp=5 is checked on a sky window,
    which is tie-free and still exercises the group + tail control
    flow."""
    key = make_key(22)
    scn = _prep(simple_scene())
    a = np.asarray(render_simple(key, 48, 208, spp=1))[192:]
    b = np.asarray(SM.film_simple_mega(key, scn, 48, 208, 1, quirks=DEFAULT,
                                       row_offset=192, rows=16,
                                       interpret=True))
    assert np.asarray(a).var() > 1e-3   # sphere-field content
    d = np.abs(a - b).max(axis=-1)
    # interpret-vs-XLA silhouette ties flip isolated samples (~0.4% of
    # pixels here); everything else is float rounding
    assert float(np.quantile(d, 0.99)) < 1e-4, np.quantile(d, 0.99)
    a = np.asarray(render_simple(key, 40, 12, spp=5))
    b = np.asarray(SM.film_simple_mega(key, scn, 40, 12, 5, quirks=DEFAULT,
                                       interpret=True))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_nodof_megakernel_route():
    """The NoDoF image via the megakernel == the XLA sample-buffer +
    reduce pipeline to within 1 uint8 step (within-pixel float summation
    is reassociated: the megakernel accumulates spp sequentially, the
    reducer sums a (sg, sg) tree - models/sample_parallel.py)."""
    from opencl_montecarlo_path_tracing_tpu.models.sample_parallel import (
        render_sample_parallel)
    from opencl_montecarlo_path_tracing_tpu.ops.reduce import quantize_film
    from tests.test_render_super import small_scene as _ss
    scn = prep_scene(_ss())
    key = make_key(15)
    a = np.asarray(render_sample_parallel(key, scn, 24, 8, sample_grid=2))
    film = M.film_super_mega(key, scn, 24, 8, 4, quirks=DEFAULT,
                             interpret=True)
    b = np.asarray(quantize_film(film))
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.max() <= 1
    assert (d == 0).mean() > 0.99


# --- VLP megakernel (ops/pallas_bpt.py): bidirectional/metropolis render ---

from opencl_montecarlo_path_tracing_tpu.models.bidirectional import (  # noqa: E402
    film_bidirectional)
from opencl_montecarlo_path_tracing_tpu.ops import pallas_bpt as B  # noqa: E402
from opencl_montecarlo_path_tracing_tpu.ops import vlp as vlpmod  # noqa: E402


# the kernel computes rsqrt(d2) and I*rs^2 where the XLA scan divides
# (lamb_num/sqrt, I/d2): ~1-ulp-per-term rounding, so the VLP films get a
# slightly looser bound than ATOL (observed max 2.2e-5 over a 10-VLP sum)
ATOL_VLP = 6e-5


def vlp_ref_film(key, scn, vlps, w, h, spp, quirks=DEFAULT, **kw):
    """XLA pipeline (the CPU backend never takes the mega route)."""
    return np.asarray(jax.jit(
        lambda k: film_bidirectional(k, scn, w, h, spp,
                                     kw.get("spp_offset", 0),
                                     kw.get("spp_total", spp), 8, quirks,
                                     precomputed_vlps=vlps))(key))


# the camera frame is fixed for 512x512 (eye_offset = -256*(up+right),
# core/camera.py); rows 300+ of the LEFT 40 columns are all floor with
# shading points at world x ~ 20-29, y ~ -89..-60 - the content band the
# gather tests render (a window at the origin is all sky and would make
# gather equality vacuous)
CONTENT_ROW = 300


def synth_vlps(n_live=10, n_dead=14, seed=0):
    """Hand-built VLP table with guaranteed live rows interleaved with
    dead ones, placed over the content band's floor points.  Emission on
    the small test scene yields almost no live VLPs (most light-pass
    rays miss), which made a plain emit_vlps-based equality test VACUOUS
    for the gather itself."""
    rng = np.random.RandomState(seed)
    n = n_live + n_dead
    v = np.zeros((n, 4), np.float32)
    live_idx = rng.choice(n, n_live, replace=False)
    v[live_idx, 0] = rng.uniform(18.0, 30.0, n_live)
    v[live_idx, 1] = rng.uniform(-95.0, -55.0, n_live)
    v[live_idx, 2] = rng.uniform(1.0, 6.0, n_live)    # above the floor
    v[live_idx, 3] = rng.uniform(0.05, 0.9, n_live)
    return jnp.asarray(v)


def test_vlp_megakernel_matches_xla():
    scn = prep_scene(small_scene())
    key = make_key(7)
    vlps = synth_vlps()
    r0, rr = CONTENT_ROW, 12
    a = vlp_ref_film(key, scn, vlps, 40, r0 + rr, 2)[r0:]
    zero = vlp_ref_film(key, scn, jnp.zeros((24, 4), jnp.float32),
                        40, r0 + rr, 2)[r0:]
    assert np.abs(a - zero).max() > 1e-3   # the gather actually contributes
    b = np.asarray(B.film_vlp_mega(key, scn, vlps, 40, r0 + rr, 2,
                                   quirks=DEFAULT, interpret=True,
                                   row_offset=r0, rows=rr))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL_VLP)


def test_vlp_megakernel_spp_group():
    """The generic G>1 grouped path (G samples sharing each table pass:
    multi-prim shared traces, multi-point VLP gather, stacked shadow
    bundles).  Production ships G=1 (the round-3 sweep: 220.8 vs 216.8
    at G=2, 187.2 at G=4 - tools/diag_sppgroup_other.py), so pin the
    machinery by patching the constant; spp=G+1 also covers the tail."""
    scn = prep_scene(small_scene())
    key = make_key(23)
    vlps = synth_vlps(seed=5)
    r0, rr = CONTENT_ROW, 8
    prev = B._VLP_SPP_GROUP
    B._VLP_SPP_GROUP = 4
    try:
        for spp in (4, 5):
            a = vlp_ref_film(key, scn, vlps, 40, r0 + rr, spp)[r0:]
            b = np.asarray(B.film_vlp_mega(key, scn, vlps, 40, r0 + rr,
                                           spp, quirks=DEFAULT,
                                           interpret=True,
                                           row_offset=r0, rows=rr))
            np.testing.assert_allclose(b, a, rtol=0, atol=ATOL_VLP)
    finally:
        B._VLP_SPP_GROUP = prev


def test_vlp_megakernel_mlt_vlps_and_window():
    """Metropolis VLP table (zero rows, depth-halved intensities) + the
    sharded renderers' spp window/row band parameters."""
    from opencl_montecarlo_path_tracing_tpu.models.metropolis import mlt_vlps
    scn = prep_scene(small_scene())
    key = make_key(8)
    vlps = mlt_vlps(key, scn, 8, 2, DEFAULT, 1e-3)
    kw = dict(spp_offset=1, spp_total=4, row_offset=4, rows=4)
    a = np.asarray(jax.jit(
        lambda k: film_bidirectional(k, scn, 16, 16, 2, 1, 4, 8, DEFAULT,
                                     precomputed_vlps=vlps))(key))[4:8]
    b = np.asarray(B.film_vlp_mega(key, scn, vlps, 16, 16, 2,
                                   quirks=DEFAULT, interpret=True, **kw))
    assert b.shape == (4, 16, 3)
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_vlp_megakernel_dead_rows_exact():
    """Dead VLPs (I == 0) contribute exactly +0.0, so the compacted
    runtime-bounded scan over a table with dead rows must be
    BIT-identical to the scan over the live rows alone (the compaction
    optimisation's correctness claim)."""
    scn = prep_scene(small_scene())
    key = make_key(17)
    vlps = np.asarray(synth_vlps(seed=3))
    assert (vlps[:, 3] > 0).any() and (vlps[:, 3] <= 0).any()
    live_only = vlps[vlps[:, 3] > 0]
    kw = dict(quirks=DEFAULT, interpret=True, row_offset=CONTENT_ROW,
              rows=8)
    a = np.asarray(B.film_vlp_mega(key, scn, jnp.asarray(vlps), 24,
                                   CONTENT_ROW + 8, 2, **kw))
    assert np.abs(a).max() > 1e-3
    b = np.asarray(B.film_vlp_mega(key, scn, jnp.asarray(live_only), 24,
                                   CONTENT_ROW + 8, 2, **kw))
    np.testing.assert_array_equal(b, a)


def test_vlp_megakernel_chunked_matches_direct():
    """Large VLP tables stream from HBM in DMA chunks (SMEM is ~32KB);
    the streaming path must equal the direct-SMEM path exactly."""
    scn = prep_scene(small_scene())
    key = make_key(9)
    vlps = synth_vlps(seed=4)
    a = np.asarray(B.film_vlp_mega(key, scn, vlps, 24, 8, 2, quirks=DEFAULT,
                                   interpret=True, force_chunked=False))
    b = np.asarray(B.film_vlp_mega(key, scn, vlps, 24, 8, 2, quirks=DEFAULT,
                                   interpret=True, force_chunked=True))
    np.testing.assert_array_equal(b, a)


def test_vlp_megakernel_gate():
    scn = prep_scene(small_scene())
    assert B.supported(scn, DEFAULT, None, None)
    assert B.supported(scn, REFERENCE, None, None)
    assert B.supported(scn, DEFAULT, object(), None)       # VLP grid: covered
    assert not B.supported(scn, REFERENCE_LMEM, None, None)
    assert not B.supported(scn, DEFAULT, None, object())   # tri override


def _vlp_grid(vlps, modifier=3.0):
    res = vlpmod.vlp_grid_static_res(int(vlps.shape[0]), modifier)
    return vlpmod.build_vlp_grid(vlps, res)


def test_vlp_megakernel_grid_matches_xla():
    """Grid mode: the cell-range-masked dense scan == the XLA per-cell
    list gather (gather_vlps_grid), on a grid with no overflowing cells
    (the masked scan is uncapped - pallas_bpt.py module docstring)."""
    scn = prep_scene(small_scene())
    key = make_key(10)
    vlps = synth_vlps(seed=5)
    grid = _vlp_grid(vlps)
    cnt = np.asarray(grid.counts)
    assert cnt.max() < grid.items.shape[1]
    r0, rr = CONTENT_ROW, 12
    a = np.asarray(jax.jit(
        lambda k: film_bidirectional(k, scn, 40, r0 + rr, 2, 0, 2, 8,
                                     DEFAULT, use_grid=True,
                                     precomputed_vlps=vlps,
                                     precomputed_grid=grid))(key))[r0:]
    zero = np.asarray(jax.jit(
        lambda k: film_bidirectional(k, scn, 40, r0 + rr, 2, 0, 2, 8,
                                     DEFAULT, use_grid=True,
                                     precomputed_vlps=jnp.zeros_like(vlps),
                                     precomputed_grid=grid))(key))[r0:]
    assert np.abs(a - zero).max() > 1e-3   # grid gather actually contributes
    b = np.asarray(B.film_vlp_mega(key, scn, vlps, 40, r0 + rr, 2,
                                   quirks=DEFAULT, interpret=True,
                                   grid=grid, row_offset=r0, rows=rr))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL_VLP)


def test_vlp_megakernel_grid_traced_res():
    """The staged CLI pipeline (--profile-stages) passes the built grid
    across a jit boundary, so EVERY grid field - including res - arrives
    as a tracer; the kernel must take them as runtime scalars (caught by
    the round-2 verify drive: ConcretizationTypeError on int(grid.res))."""
    scn = prep_scene(small_scene())
    key = make_key(16)
    vlps = synth_vlps(seed=6)
    grid = _vlp_grid(vlps)
    a = np.asarray(B.film_vlp_mega(key, scn, vlps, 24, 8, 2, quirks=DEFAULT,
                                   interpret=True, grid=grid))
    b = np.asarray(jax.jit(
        lambda k, v, g: B.film_vlp_mega(k, scn, v, 24, 8, 2, quirks=DEFAULT,
                                        interpret=True, grid=g))(
        key, vlps, grid))
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-7)


def test_vlp_megakernel_grid_chunked_matches_direct():
    scn = prep_scene(small_scene())
    key = make_key(11)
    vlps = synth_vlps(seed=7)
    grid = _vlp_grid(vlps)
    a = np.asarray(B.film_vlp_mega(key, scn, vlps, 24, 8, 2, quirks=DEFAULT,
                                   interpret=True, grid=grid,
                                   force_chunked=False))
    b = np.asarray(B.film_vlp_mega(key, scn, vlps, 24, 8, 2, quirks=DEFAULT,
                                   interpret=True, grid=grid,
                                   force_chunked=True))
    np.testing.assert_array_equal(b, a)


def test_vlp_megakernel_grid_outside_box_dark():
    """Shading points outside the VLP bounding box gather nothing
    (gather_vlps_grid's in-box check): shrink the grid to a corner and the
    masked scan must agree with the XLA gather everywhere."""
    from opencl_montecarlo_path_tracing_tpu.ops import grid as gridmod
    scn = prep_scene(small_scene())
    key = make_key(14)
    vlps = synth_vlps(seed=8)
    # a tiny grid nowhere near most shading points
    vmin = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    cell = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    res = (2, 2, 2)
    vi = vlps[:, 3]
    r = 16.0 * jnp.sqrt(jnp.maximum(vi, 0.0))
    ok = vi > 0
    far = jnp.float32(3e38)
    amin = jnp.where(ok[:, None], vlps[:, :3] - r[:, None], far)
    amax = jnp.where(ok[:, None], vlps[:, :3] + r[:, None], far)
    grid = gridmod.build_grid_cellscan(amin, amax, vmin, cell, res)
    a = np.asarray(jax.jit(
        lambda k: film_bidirectional(k, scn, 24, 8, 2, 0, 2, 8, DEFAULT,
                                     use_grid=True, precomputed_vlps=vlps,
                                     precomputed_grid=grid))(key))
    b = np.asarray(B.film_vlp_mega(key, scn, vlps, 24, 8, 2,
                                   quirks=DEFAULT, interpret=True,
                                   grid=grid))
    np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)


def test_stream_segment_pregate_sky_window():
    """Round 5: the SEGMENT PRE-GATE (_segment_pregate) skips a missed
    segment's whole prepass under pl.when.  An all-sky window (the top
    of the fixed 512^2 camera frame looks above every mesh) drives the
    ALL-SKIPPED path end to end - every primary bundle misses every
    segment box, so all four segments' prepasses are skipped and the
    take counts stay 0 - and must still equal the XLA film (sky
    gradient + floor horizon, no triangle terms).  A content window in
    the same configuration covers the mixed skip/hit path (also pinned
    by test_megakernel_stream_tier)."""
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
    from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
    scn = prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(center=(17.959, 4.252, 10.25),
                             n_major=10, n_minor=6),
        lights=np.array([[10, 4, 10, 200]], np.float32),
    ))
    key = make_key(77)
    prev = M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP
    M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = 8, 2, 4, 2
    try:
        assert -(-120 // M._TRI_BLOCK) > M._SEG   # multi-segment
        for row0 in (0, 150):   # all-sky window, then content window
            kw = dict(row_offset=row0, rows=8)
            a = ref_film(key, scn, 40, row0 + 8, 2, **kw)
            b = np.asarray(M.film_super_mega(key, scn, 40, row0 + 8, 2,
                                             quirks=DEFAULT,
                                             interpret=True,
                                             force_stream=True, **kw))
            np.testing.assert_allclose(b, a, rtol=0, atol=ATOL)
    finally:
        M._TRI_BLOCK, M._MACRO, M._SEG, M._IGRP = prev
