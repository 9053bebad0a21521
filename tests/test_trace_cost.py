"""Trace-cost guards (docs/PERF.md "Tracing cost is a first-class
constraint").

On JAX 0.9 each traced jnp op costs ~0.3-0.9 ms, so the megakernels keep
their traced-eqn counts bounded with jit-wrapped row helpers (one cached
pjit eqn per call) and sublane bundle stacking (one tall op per row
instead of one per bundle).  These tests pin both properties:

1. the jitted helpers are bit-identical to their unjitted originals
   (``.__wrapped__``) on random inputs;
2. the UNROLLED (TPU-form) kernel trace of a blocked and a stream
   mesh stays within an eqn budget - a reintroduced per-bundle unroll
   multiplies the count by the bundle count (~8x) and fails loudly
   here instead of as a silent 30-minute compile on chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    demo_scene, torus_mesh)
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene


def _rand(rng, shape=(8, 128)):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_jitted_row_helpers_match_wrapped():
    # compare the jitted helper against jit(__wrapped__): both sides
    # compile the identical op sequence, so any static-arg misrouting
    # or signature drift in the wrapper shows as a value difference.
    # (eager __wrapped__ would differ by CPU fusion/FMA on razor ties -
    # inside the Pallas kernel both forms are traced, never eager.)
    rng = np.random.default_rng(7)
    r9 = [jnp.float32(v) for v in rng.standard_normal(9)]
    r13 = [jnp.float32(v) for v in rng.standard_normal(13)]
    o = [_rand(rng) for _ in range(3)]
    d = [_rand(rng) for _ in range(3)]
    occ = jnp.zeros((8, 128), jnp.int32)
    for neg_t in (False, True):
        got = M._tri_occ_row(r9, *o, *d, neg_t, np.float32(1e6), occ)
        want = jax.jit(M._tri_occ_row.__wrapped__, static_argnums=(7,))(
            r9, *o, *d, neg_t, np.float32(1e6), occ)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    carry = (jnp.full((8, 128), 1e9, jnp.float32), jnp.ones((8, 128)),
             jnp.full((8, 128), -1.0), occ, o[0], o[1], o[2], occ)
    got = M._tri_closest_row_blocked(r13, *o, *d, False, carry)
    want = jax.jit(M._tri_closest_row_blocked.__wrapped__,
                   static_argnums=(7,))(r13, *o, *d, False, carry)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    k0 = jnp.uint32(0x1234)
    k1 = jnp.uint32(0x9abc)
    x0 = jnp.asarray(rng.integers(0, 2**32, (8, 128)), jnp.uint32)
    x1 = jnp.zeros_like(x0)
    got = M._threefry(k0, k1, x0, x1)
    want = jax.jit(M._threefry.__wrapped__)(k0, k1, x0, x1)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _count_eqns(jaxpr, seen=None):
    """Total eqns with sub-jaxprs counted ONCE per identity - cached
    pjit calls share one traced jaxpr, so this tracks what tracing
    actually paid (an un-jitted helper re-traces per call and the
    count multiplies by the call count)."""
    if seen is None:
        seen = set()
    if id(jaxpr) in seen:
        return 0
    seen.add(id(jaxpr))
    n = 0
    for eqn in jaxpr.eqns:
        n += 1
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                n += _count_eqns(v.jaxpr, seen)
            elif isinstance(v, jax.extend.core.Jaxpr):
                n += _count_eqns(v, seen)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, jax.extend.core.ClosedJaxpr):
                        n += _count_eqns(x.jaxpr, seen)
                    elif isinstance(x, jax.extend.core.Jaxpr):
                        n += _count_eqns(x, seen)
    return n


def test_stream_trace_size_constant_in_segments():
    """Multi-segment STREAM scans trace ONE fori body over the segments
    (pallas_super._seg_loop), so the kernel program is O(1) in mesh
    size: shrinking _SEG until the same mesh spans 4 segments must not
    grow the traced-eqn count meaningfully.  The former Python unroll
    grew it linearly (8 segment bodies at 1M triangles - a ~26-minute
    compile, ~80% Mosaic/XLA on the unrolled program)."""
    base, _ = demo_scene()
    scn = prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=32, n_minor=64),   # 4096 tris = 32
        lights=base.lights))                            # default blocks

    def count(seg):
        prev = M._SEG
        M._SEG = seg
        try:
            jaxpr = jax.make_jaxpr(
                lambda k: M.film_super_mega(k, scn, 64, 32, 4,
                                            force_stream=True))(make_key(1))
        finally:
            M._SEG = prev
        return _count_eqns(jaxpr.jaxpr)

    one = count(1024)   # 32 blocks -> 1 segment (static path)
    four = count(8)     # 32 blocks -> 4 segments (one traced fori body)
    assert four < 1.4 * one + 200, (
        f"4-segment stream trace has {four} eqns vs {one} single-segment: "
        "the segment loop is being unrolled again (see _seg_loop)")


@pytest.mark.parametrize("force", ["blocked", "stream"])
def test_unrolled_kernel_trace_eqn_budget(force):
    base, _ = demo_scene()
    scn = prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=16, n_minor=32), lights=base.lights))
    kw = {"force_blocked": True} if force == "blocked" else {
        "force_stream": True}
    # interpret=False keeps _UNROLL on - the TPU-form trace whose eqn
    # count the jit-wrapping/stacking bounds.  make_jaxpr only STAGES
    # (the Pallas kernel is traced to a jaxpr, nothing compiles), so
    # this runs on the CPU test backend.
    jaxpr = jax.make_jaxpr(
        lambda k: M.film_super_mega(k, scn, 64, 32, 4, **kw))(make_key(1))
    n = _count_eqns(jaxpr.jaxpr)
    # measured after the round-3 trace-cost rework: 5,773 (blocked) /
    # 6,223 (stream) deduped eqns.  A per-bundle row unroll regression
    # lands at ~8x this.
    budget = 12_000
    assert n < budget, (
        f"{force} kernel trace has {n} eqns (budget {budget}): a "
        "trace-cost regression (per-bundle unroll / un-jitted row "
        "helper?) - see docs/PERF.md 'Tracing cost'")
