"""Pallas TPU megakernel: the COMPLETE super sample step in one kernel.

One program renders a 2048-pixel tile for all spp: counter-based threefry
draws, thin-lens camera rays, the full primitive scan (floor / squares /
spheres / division-free Moller-Trumbore triangles), one shadow trace per
light (uncapped by default; the _lmem carry-t quirk runs sequential
seeded closest-hit traces), 4-material shading and film accumulation -
the film tile lives in VMEM registers across the whole spp loop and is
written to HBM once.  Reference hot loop:
CLSuperPathTracer/pathtracer.ocl:220-241 (the per-pixel megakernel this
mirrors, wavefront-style).

Layout: rays are lane-major (_SUB x 128) vregs end to end - every per-ray
quantity is a (16, 128) f32/uint32 array, so all arithmetic runs on the
VPU at full width with no relayouts.  Scene primitives are compile-time
constants: squares/spheres/lights unroll with literal immediates; the
triangle table streams from SMEM as scalars broadcast against the ray
lanes (_TRI_UNROLL rows per loop step for ILP).  There is no MXU use on
purpose: at reference scene sizes (~100 triangles) the K=13 matmul
formulation pays a 48x pad+precision penalty (docs/PERF.md), while this
VPU form needs ~48 ops per (ray, triangle) pair.

Semantics match models/super.py::sample_super for the mirror-free super
family (sphere material 3, one effective bounce) to float rounding; the
equality is pinned by tests/test_megakernel.py and gated in film_super.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.camera import make_camera
from ..core.quirks import Quirks
from ..models import common as C

_EPS = np.float32(0.01)
_BIG = np.float32(1e9)
_SUB = 16                  # sublane rows per ray tile
_TILE = _SUB * 128         # rays per grid step
_TRI_UNROLL = 8            # triangle rows per fori step

_SPP_GROUP = 1             # SMEM-tier spp samples per group.  The round-2
                           # sweep (pre-stacking, G separate bodies) read
                           # G=2 286 / G=4 290 / G=8 263 Mpaths/s; the
                           # round-3 unified tall (G*SUB, 128) body flipped
                           # it - interleaved on-chip A/B at 1024^2x1024
                           # (tools/diag_sppgroup_chip.py): G=1 307.6,
                           # G=2 294.9, G=4 247.5, G=8 168.3.  Post-
                           # stacking, vreg pressure beats the shared SMEM
                           # row reads at every G > 1.
_SPP_GROUP_BLOCKED = 2     # blocked/stream-tier group: here G also divides
                           # the take-list prepass and per-block AABB DMA
                           # (one union take-list per group), so the
                           # optimum sits higher - interleaved A/B on the
                           # 20k torus at 512^2x8 amortized
                           # (tools/diag_sppgroup_blocked.py): G=1 69.7,
                           # G=2 80.0, G=4 64.7 Mpaths/s
_TRI_BLOCK = 128           # triangles per Morton block (one DMA chunk)
_MACRO = 8                 # blocks per macro group: host-side Morton
                           # blocks are ordered near-to-far in groups of
                           # _MACRO (spatially compact under the curve)
_IGRP = 8                  # blocks per INTERVAL-GATE lane column: the
                           # (6*_IGRP, ng) AABB table puts block g*8+u at
                           # sublane u, lane g, so one vector op interval-
                           # tests 8*128 = 1024 blocks and the per-group
                           # flags pack into an 8-bit SMEM mask; 8 = the
                           # f32 sublane tile (tests shrink it to drive
                           # the gate with interpret-sized meshes)
_SEG = 1024                # blocks per scan SEGMENT (131k triangles).
                           # Multi-segment scans re-run the flag prepass
                           # between near-to-far segments with the t/occ
                           # carries the earlier ones established - the
                           # dynamic re-prune a static take-list cannot
                           # see.  Measured A/B at 20k-65k triangles:
                           # each extra segment costs ~2 flag-DMA waits
                           # (~3 us each) per trace while the re-prune
                           # saves only ~2 taken blocks/tile on the
                           # torus scenes - a net ~10% loss - so _SEG
                           # keeps every <= 131k-tri mesh in ONE segment;
                           # segmentation exists as the streaming
                           # mechanism for meshes beyond the SMEM AABB
                           # budget (tests shrink it to pin the
                           # multi-segment path's exactness)
_RCHUNK = 256              # blocks per stream-tier exact-refinement AABB
                           # DMA chunk: the (8, _RCHUNK) f32 SMEM slice
                           # costs 8 KB - a whole-segment slice
                           # (8, _SEG) alone would blow the ~32 KB SMEM
                           # budget.  Chunk starts stay 128-lane aligned
                           # on hardware because _SEG % _RCHUNK == 0
                           # (tiny-test configs shrink _SEG below
                           # _RCHUNK; the chunk grid then anchors at the
                           # table origin, which interpret mode accepts)
_STREAM_REFINE = True      # stream tier: refine the interval-gate flags
                           # with the exact per-lane tests (measured
                           # 1.70x at equal 65k geometry without it -
                           # tools/diag_tier_gap.py); False keeps the
                           # round-3 gate-only behavior for A/Bs
_TW, _TH = 64, 32          # blocked-mode pixel tile (64 x 32 = _TILE rays):
                           # a compact footprint keeps the tile frustum
                           # narrow so the any-lane AABB skip actually
                           # skips (a row-major strip spans the full image
                           # width and defeats the cull)

_U32 = jnp.uint32
_ROTS = ((13, 15, 26, 6), (17, 29, 16, 24))
_PARITY = np.uint32(0x1BD11BDA)

# Short static-trip hot loops run as straight-line code on hardware
# (headline 290 -> 298 Mpaths/s); loops of up to this many steps are
# Python-unrolled.  Interpret mode (CPU tests) keeps real fori_loops
# instead - the unrolled trace is ~16x bigger and XLA-CPU compiles each
# repetition, which made the interpret megakernel tests minutes-slow.
# The two forms run the identical body in the identical order.
_UNROLL_STEPS_MAX = 16

_DIAG_SPLIT = ""   # diagnostic cost-split knob (tools/diag_prepass_split
                   # .py patches it): "noscan" keeps the flag prepass +
                   # take-list build but skips the taken-block scans;
                   # "noblocks" skips the whole blocked stage.  Films are
                   # WRONG under either - never set outside diagnostics.
_UNROLL = True   # toggled off by film_super_mega(interpret=True)


def _static_fori(n_steps: int, body, carry):
    """fori_loop that fully unrolls small static trip counts (same
    iteration order, so results are bit-identical)."""
    if _UNROLL and n_steps <= _UNROLL_STEPS_MAX:
        for i in range(n_steps):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, n_steps, body, carry)


def _threefry(k0, k1, x0, x1):
    """20-round Threefry-2x32 on (SUB, 128) uint32 vectors (bit-identical
    to core/rng.py::threefry2x32; k0/k1/x1 are scalars, x0 a vector)."""
    ks = [k0, k1, k0 ^ k1 ^ _PARITY]
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(5):
        for r in _ROTS[i % 2]:
            x0 = x0 + x1
            x1 = ((x1 << np.uint32(r)) | (x1 >> np.uint32(32 - r))) ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + np.uint32(i + 1)
    return x0, x1


# The row/RNG helpers below are rebound through jax.jit: they are invoked
# hundreds-to-thousands of times per KERNEL TRACE (per unrolled row x
# bundle x segment), and on this JAX each traced jnp op costs ~0.3-0.9 ms
# of pure tracing time - a 65k-triangle stream kernel spent ~200 s in
# .lower() on ~127k traced ops.  A jitted helper is traced ONCE per aval
# signature and thereafter binds one cached pjit eqn per call (~0.1 ms),
# which Mosaic inlines during lowering - the emitted vector program, and
# therefore the image, is bit-identical (tests/test_megakernel.py pins
# equality; tools/diag_stream_compile.py measured 26x faster lowering).


_threefry = jax.jit(_threefry)


def _unit(bits):
    # Mosaic has no uint32->f32 cast; bits>>8 < 2^24 so the int32 view is
    # value-identical
    i = (bits >> np.uint32(8)).astype(jnp.int32)
    return i.astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _normalize3(x, y, z):
    inv = np.float32(1.0) / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _tri_closest_row(r, ox, oy, oz, dx, dy, dz, neg_t: bool, carry):
    """Division-free Moller-Trumbore closest-hit update for one packed
    triangle row ``r`` (12 broadcast scalars: v0, e0, e2, n) against the
    ray vregs - the running minimum is carried det-scaled as (bn, bd)
    (ops/intersect.py::trace_ray triangle scan)."""
    one = np.float32(1.0)
    bn, bd, m, nx, ny, nz, needs = carry
    pvx = dy * r[8] - dz * r[7]
    pvy = dz * r[6] - dx * r[8]
    pvz = dx * r[7] - dy * r[6]
    det = r[3] * pvx + r[4] * pvy + r[5] * pvz
    tvx, tvy, tvz = ox - r[0], oy - r[1], oz - r[2]
    un = tvx * pvx + tvy * pvy + tvz * pvz
    qvx = tvy * r[5] - tvz * r[4]
    qvy = tvz * r[3] - tvx * r[5]
    qvz = tvx * r[4] - tvy * r[3]
    vn = dx * qvx + dy * qvy + dz * qvz
    tn = r[6] * qvx + r[7] * qvy + r[8] * qvz
    sg = jnp.where(det >= 0, one, -one)
    dd = det * sg
    un_s = un * sg
    vn_s = vn * sg
    tn_s = tn * sg
    ok = ((dd >= _EPS) & (un_s >= 0.0) & (un_s <= dd)
          & (vn_s >= 0.0) & (un_s + vn_s <= dd))
    if not neg_t:
        ok = ok & (tn_s > _EPS * dd)
    ok = ok & (tn_s * bd < bn * dd)
    bn = jnp.where(ok, tn_s, bn)
    bd = jnp.where(ok, dd, bd)
    m = jnp.where(ok, 4, m)
    nx = jnp.where(ok, r[9], nx)
    ny = jnp.where(ok, r[10], ny)
    nz = jnp.where(ok, r[11], nz)
    needs = jnp.where(ok, 0, needs)
    return bn, bd, m, nx, ny, nz, needs


_tri_closest_row = jax.jit(_tri_closest_row, static_argnums=(7,))


def _tri_closest_row_blocked(r, ox, oy, oz, dx, dy, dz, neg_t: bool, carry):
    """Blocked-mode closest-hit update: same math as _tri_closest_row plus
    an original-index tie-break (r[12], carried as ``bi``).  Triangles are
    Morton-reordered in blocked mode, and the sequential scan's strict <
    makes the FIRST-tested triangle win exact cross-product ties (shared
    mesh edges) - preferring the lowest original index reproduces the
    file-order winner.  ``bi`` starts at -1 so a tie against a
    non-triangle hit (floor/sphere, tested first in every order) is never
    stolen."""
    one = np.float32(1.0)
    bn, bd, bi, m, nx, ny, nz, needs = carry
    pvx = dy * r[8] - dz * r[7]
    pvy = dz * r[6] - dx * r[8]
    pvz = dx * r[7] - dy * r[6]
    det = r[3] * pvx + r[4] * pvy + r[5] * pvz
    tvx, tvy, tvz = ox - r[0], oy - r[1], oz - r[2]
    un = tvx * pvx + tvy * pvy + tvz * pvz
    qvx = tvy * r[5] - tvz * r[4]
    qvy = tvz * r[3] - tvx * r[5]
    qvz = tvx * r[4] - tvy * r[3]
    vn = dx * qvx + dy * qvy + dz * qvz
    tn = r[6] * qvx + r[7] * qvy + r[8] * qvz
    sg = jnp.where(det >= 0, one, -one)
    dd = det * sg
    un_s = un * sg
    vn_s = vn * sg
    tn_s = tn * sg
    ok = ((dd >= _EPS) & (un_s >= 0.0) & (un_s <= dd)
          & (vn_s >= 0.0) & (un_s + vn_s <= dd))
    if not neg_t:
        ok = ok & (tn_s > _EPS * dd)
    num = tn_s * bd
    den = bn * dd
    ok = ok & ((num < den) | ((num == den) & (r[12] < bi)))
    bn = jnp.where(ok, tn_s, bn)
    bd = jnp.where(ok, dd, bd)
    bi = jnp.where(ok, jnp.zeros_like(bi) + r[12], bi)
    m = jnp.where(ok, 4, m)
    nx = jnp.where(ok, r[9], nx)
    ny = jnp.where(ok, r[10], ny)
    nz = jnp.where(ok, r[11], nz)
    needs = jnp.where(ok, 0, needs)
    return bn, bd, bi, m, nx, ny, nz, needs


_tri_closest_row_blocked = jax.jit(_tri_closest_row_blocked,
                                   static_argnums=(7,))


def _tri_occ_row(r, ox, oy, oz, dx, dy, dz, neg_t: bool, tl, occ):
    """Occlusion update for one packed triangle row (9 scalars used)."""
    one = np.float32(1.0)
    pvx = dy * r[8] - dz * r[7]
    pvy = dz * r[6] - dx * r[8]
    pvz = dx * r[7] - dy * r[6]
    det = r[3] * pvx + r[4] * pvy + r[5] * pvz
    tvx, tvy, tvz = ox - r[0], oy - r[1], oz - r[2]
    un = tvx * pvx + tvy * pvy + tvz * pvz
    qvx = tvy * r[5] - tvz * r[4]
    qvy = tvz * r[3] - tvx * r[5]
    qvz = tvx * r[4] - tvy * r[3]
    vn = dx * qvx + dy * qvy + dz * qvz
    tn = r[6] * qvx + r[7] * qvy + r[8] * qvz
    sg = jnp.where(det >= 0, one, -one)
    dd = det * sg
    un_s = un * sg
    vn_s = vn * sg
    tn_s = tn * sg
    ok = ((dd >= _EPS) & (un_s >= 0.0) & (un_s <= dd)
          & (vn_s >= 0.0) & (un_s + vn_s <= dd)
          & (tn_s < tl * dd))
    if not neg_t:
        ok = ok & (tn_s > _EPS * dd)
    return jnp.where(ok, 1, occ)


_tri_occ_row = jax.jit(_tri_occ_row, static_argnums=(7,))


def _slab(aabb6, ox, oy, oz, inv_dx, inv_dy, inv_dz):
    """Ray-AABB slab interval (tmin, tmax) on vregs; 6 broadcast scalars."""
    tx0 = (aabb6[0] - ox) * inv_dx
    tx1 = (aabb6[3] - ox) * inv_dx
    ty0 = (aabb6[1] - oy) * inv_dy
    ty1 = (aabb6[4] - oy) * inv_dy
    tz0 = (aabb6[2] - oz) * inv_dz
    tz1 = (aabb6[5] - oz) * inv_dz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                   jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1))
    return tmin, tmax


# t-prune slack: the slab tmin is rounded float arithmetic while the
# proof "hit t >= box entry t" holds in exact arithmetic - compare with
# relative headroom so rounding can only keep a block, never drop one.
_PRUNE_SLACK = np.float32(1.0 + 1e-3)
_BIGF = np.float32(3e38)


@functools.partial(jax.jit, static_argnums=(5,))
def _box_hit_closest(a6, o3, inv3, bn, bd, neg_t: bool):
    """Per-ray conservative slab + running-(bn, bd) t-prune for one block
    AABB (the closest-hit prepass predicate).  Jitted: the exact tier
    traces this per (block, ray) - see the trace-cost note above
    _threefry."""
    tmin, tmax = _slab(a6, o3[0], o3[1], o3[2], inv3[0], inv3[1], inv3[2])
    hit = tmax >= tmin
    if not neg_t:
        hit = hit & (tmax >= _EPS)
        hit = hit & (jnp.maximum(tmin, 0.0) * bd <= bn * _PRUNE_SLACK)
    return hit


@functools.partial(jax.jit, static_argnums=(5,))
def _box_hit_occ(a6, o3, inv3, tl, gate, neg_t: bool):
    """Per-ray conservative slab + shadow-t prune (+ optional lane gate)
    for one block AABB (the occlusion prepass predicate).  Jitted (see
    _box_hit_closest)."""
    tmin, tmax = _slab(a6, o3[0], o3[1], o3[2], inv3[0], inv3[1], inv3[2])
    hit = tmax >= tmin
    if not neg_t:
        hit = hit & (tmax >= _EPS) & (tmin <= tl * _PRUNE_SLACK)
    if gate is not None:
        hit = hit & gate
    return hit


@functools.partial(jax.jit, static_argnums=(4, 6))
def _interval_test(comp, o3, d3, thi, tlo, gate, neg_t: bool):
    """Full conservative interval slab test for one bundle over the
    lanes in ``gate`` (None = all): (_IGRP, ng) bool.  ``comp`` is the
    6-tuple of (lo/hi per axis) block-AABB rows; ``thi`` the bundle's
    per-lane t bound (None = unbounded); ``tlo`` the anchored forward
    floor (static float; see _anchor_bundles).  Jitted: the sign-split
    stream gate calls this 6x per bundle per segment and each trace
    costs ~200 jnp ops (see the trace-cost note above _threefry)."""
    zero = np.float32(0.0)
    ng = comp[0].shape[1]

    def lo_(v):
        if gate is not None:
            v = jnp.where(gate, v, _BIGF)
        return jnp.min(v, axis=(0, 1), keepdims=True)

    def hi_(v):
        if gate is not None:
            v = jnp.where(gate, v, -_BIGF)
        return jnp.max(v, axis=(0, 1), keepdims=True)

    olo = [lo_(v) for v in o3]
    ohi = [hi_(v) for v in o3]
    dlo = [lo_(v) for v in d3]
    dhi = [hi_(v) for v in d3]
    ent = jnp.full((_IGRP, ng), -_BIGF, jnp.float32)
    exi = jnp.full((_IGRP, ng), _BIGF, jnp.float32)
    for c in range(3):
        lo_p, hi_p = comp[c], comp[c + 3]
        # reciprocal interval only valid when the direction keeps
        # one strict sign across the bundle (NaN/inf products from
        # the mixed case are discarded by the select)
        mixed = dlo[c] * dhi[c] <= zero              # (1, 1)
        ilo = np.float32(1.0) / dhi[c]
        ihi = np.float32(1.0) / dlo[c]
        alo, ahi = lo_p - ohi[c], lo_p - olo[c]
        blo, bhi = hi_p - ohi[c], hi_p - olo[c]
        t0lo = jnp.minimum(jnp.minimum(alo * ilo, alo * ihi),
                           jnp.minimum(ahi * ilo, ahi * ihi))
        t0hi = jnp.maximum(jnp.maximum(alo * ilo, alo * ihi),
                           jnp.maximum(ahi * ilo, ahi * ihi))
        t1lo = jnp.minimum(jnp.minimum(blo * ilo, blo * ihi),
                           jnp.minimum(bhi * ilo, bhi * ihi))
        t1hi = jnp.maximum(jnp.maximum(blo * ilo, blo * ihi),
                           jnp.maximum(bhi * ilo, bhi * ihi))
        near = jnp.minimum(t0lo, t1lo)
        far = jnp.maximum(t0hi, t1hi)
        ent = jnp.maximum(ent, jnp.where(mixed, -_BIGF, near))
        exi = jnp.minimum(exi, jnp.where(mixed, _BIGF, far))
    ent = ent - (jnp.abs(ent) * np.float32(1e-3) + np.float32(1e-3))
    exi = exi + (jnp.abs(exi) * np.float32(1e-3) + np.float32(1e-3))
    hit = exi >= ent
    if not neg_t:
        # anchored bundles (tlo < 0): block crossings sit at anchored
        # t' >= -(rounding at box scale), so the forward-half check
        # relaxes by the bundle's slack instead of dropping to a line
        # test (see _anchor_bundles)
        tlo = np.float32(0.5) * _EPS if tlo is None else np.float32(tlo)
        hit = hit & (exi >= tlo)
        if thi is not None:
            th = hi_(thi)
            hit = hit & (jnp.maximum(ent, zero) <= th * _PRUNE_SLACK)
    if gate is not None:
        some = jnp.max(gate.astype(jnp.int32), axis=(0, 1),
                       keepdims=True) > 0
        hit = hit & some
    return hit


def _interval_union_flags(tri, bundles, neg_t: bool, b0=0):
    """Vector-only interval-frustum gate over ALL blocks.

    Each bundle's rays reduce to conservative per-component origin /
    direction / t intervals with keepdims min/max (pure vector ops - no
    vector->scalar sync), and interval slab tests run against the
    (6*_IGRP, ng) lane-major block-AABB table: _IGRP blocks per lane
    column, so one vector op tests _IGRP*128 blocks.  A sign-mixed
    direction component (its reciprocal interval is unbounded)
    contributes no constraint on that axis.  Outward relative slack on
    the entry/exit bounds means f32 rounding can only KEEP a block the
    exact per-lane test might take, never drop one - the gate is a
    strict superset of the per-lane any-lane union, so gating the exact
    tests and the take-list walk behind it never changes the image
    (host-measured superset factor: 1.3x at 20k triangles, 2.3x at 65k,
    zero misses - tools/diag_interval_host.py).

    The per-group block masks (bit u = block g*_IGRP+u) land in
    iflags_s[0, g] with one DMA.  This replaces the round-3 macro-AABB
    level, whose per-block SMEM-scalar->vector broadcasts were the
    dominant linear-in-scene cost (~15 ms/frame at 65k triangles:
    tools/diag_blocked_parts.py noslab ablation, docs/PERF.md).

    STREAM mode (meshes past the exact-flag SMEM budget, tri["stream"])
    gates one SEGMENT at a time: the gate reads only the segment's
    group columns [b0/_IGRP, +cols) of the HBM AABB table and its bit
    masks land in the segment-sized (_IGRP, cols) iflags buffers, so
    SMEM use is constant in mesh size.  The default geometry keeps the
    column slice 128-lane aligned (_SEG = _IGRP * 128).

    Because stream flags are FINAL (no exact refinement trims them),
    stream mode tightens each bundle with a per-axis SIGN SPLIT: for
    each axis, the full interval test runs twice - lanes with d_a > 0
    and lanes with d_a <= 0 - and the bundle takes
    AND_axes(OR_sign-halves).  A lane that hits a block lies in one
    sign half per axis and its half's test must pass, so every axis's
    OR covers it: the AND stays a superset of the exact per-lane union.
    The win is on sign-MIXED axes, where the un-split gate has no
    constraint at all and takes whole depth columns (host sim at 262k
    primaries: 5921 -> 3402 block scans/frame vs 2372 exact; 1.7x cut
    at 65k-262k, 1.22x at 20k)."""
    aiv = tri["aabb_iv"]
    stream = bool(tri.get("stream"))
    if stream and "aiv_v" in tri:
        # multi-segment: the gate table lives in HBM as
        # (n_seg, 6*_IGRP, cols) and the segment's slice is DMA'd in by
        # a dynamic LEADING-dim index (the double-buffering idiom) -
        # the index may be a TRACED segment base (the multi-segment
        # scan runs as ONE fori body, see _seg_loop).  Lane-dim dynamic
        # slicing is avoided entirely: Mosaic either cannot prove
        # 128-lane alignment (divisions hide the factor) or, with a
        # provable start, the 262k program compiled but hung on chip.
        ng = tri["iflags_v"].shape[1]
        aiv_v = tri["aiv_v"]
        cp = pltpu.make_async_copy(aiv.at[b0 // _SEG], aiv_v,
                                   tri["aivsem"])
        cp.start()
        cp.wait()
        comp = [aiv_v[pl.ds(c * _IGRP, _IGRP), :] for c in range(6)]
    elif stream:
        # single-segment stream: the (6*_IGRP, cpad) gate table is a
        # VMEM-resident BlockSpec input - read it directly at zero
        # per-call cost (the leading index is the constant 0)
        assert b0 == 0
        ng = tri["iflags_v"].shape[1]
        comp = [aiv[pl.ds(c * _IGRP, _IGRP), :] for c in range(6)]
    else:
        assert b0 == 0
        ng = aiv.shape[1]
        comp = [aiv[pl.ds(c * _IGRP, _IGRP), :] for c in range(6)]
    zero = np.float32(0.0)
    comp_t = tuple(comp)

    def interval_test(b, gate):
        return _interval_test(comp_t, tuple(b["o"]), tuple(b["d"]),
                              b["thi"], b.get("tlo"), gate, neg_t)

    acc = None
    for b in bundles:
        gate = b["gate"]
        if stream:
            hit = None
            for a in range(3):
                da = b["d"][a]
                pos = da > zero
                ha = None
                for half in (pos, ~pos):
                    g = half if gate is None else (gate & half)
                    h = interval_test(b, g)
                    ha = h if ha is None else ha | h
                hit = ha if hit is None else hit & ha
        else:
            hit = interval_test(b, gate)
        acc = hit if acc is None else acc | hit
    flags = acc.astype(jnp.int32)
    sh = jax.lax.broadcasted_iota(jnp.int32, (_IGRP, ng), 0)
    bits = jnp.sum(flags << sh, axis=0, keepdims=True)
    iflags_v = tri["iflags_v"]
    iflags_v[...] = jnp.broadcast_to(bits, (_IGRP, ng))
    cp = pltpu.make_async_copy(iflags_v, tri["iflags_s"], tri["fsem"])
    cp.start()
    cp.wait()


def _segment_pregate(tri, bundles, neg_t: bool):
    """SEGMENT PRE-GATE (round 5): one sign-split interval test of every
    bundle against the n_seg SEGMENT boxes (each the union of its blocks'
    AABBs - host build in film_super_mega), bits packed into SMEM -
    segments no bundle can touch then skip their ENTIRE per-segment
    prepass (gate-table DMA + sign-split interval tests + exact
    refinement + take-list group walk) in _prepass_take_gated.

    Soundness across the scan: a bundle that exact-takes a block at
    segment s also passes this test - the t bound only TIGHTENS from the
    entry carry used here, the occ gate only SHRINKS, the segment box
    contains the block's AABB, and _interval_test's outward slack means
    f32 rounding can only keep a bit.  So no taken block's segment is
    ever skipped and the film is bit-identical.

    Motivation: at 1M triangles the per-segment prepass machinery
    measured 45.7% of the frame (tools/diag_prepass_split.py), mostly
    per-segment FIXED cost x 8 segments x 4 prepasses - while primary
    tile frusta are narrow and shadow bundles anchor near the mesh, so
    most (bundle, segment) pairs are provably empty."""
    segiv = tri["segiv"]
    comp = tuple(segiv[pl.ds(c * _IGRP, _IGRP), :] for c in range(6))
    zero = np.float32(0.0)
    acc = None
    for b in bundles:
        gate = b["gate"]
        hit = None
        for a in range(3):
            da = b["d"][a]
            pos = da > zero
            ha = None
            for half in (pos, ~pos):
                g = half if gate is None else (gate & half)
                h = _interval_test(comp, tuple(b["o"]), tuple(b["d"]),
                                   b["thi"], b.get("tlo"), g, neg_t)
                ha = h if ha is None else ha | h
            hit = ha if hit is None else hit & ha
        acc = hit if acc is None else acc | hit
    flags = acc.astype(jnp.int32)
    sh = jax.lax.broadcasted_iota(jnp.int32, flags.shape, 0)
    bits = jnp.sum(flags << sh, axis=0, keepdims=True)   # (1, lanes)
    tri["segm_v"][...] = bits
    cp = pltpu.make_async_copy(tri["segm_v"], tri["segm_s"],
                               tri["segsem"])
    cp.start()
    cp.wait()


def _prepass_take_gated(tri, b0, bn, prepass_fn):
    """Run ``prepass_fn()`` + the take-list build for segment
    [b0, b0+bn) and return the taken count - or skip BOTH at zero cost
    when the segment pre-gate proved no bundle touches the segment box
    (multi-segment streams with ``segiv``; everything else passes
    through unchanged)."""
    if "segm_s" not in tri:
        prepass_fn()
        return _take_list(tri, b0, bn)
    s = b0 // _SEG
    g = s // _IGRP
    u = s - g * _IGRP
    tri["cnt"][0, 0] = jnp.int32(0)

    def _run():
        prepass_fn()
        _take_list(tri, b0, bn)

    pl.when(((tri["segm_s"][0, g] >> u) & 1) != 0)(_run)
    return tri["cnt"][0, 0]


def _group_chunks(b0: int, bn: int):
    """Static (group, u0, u1) spans covering blocks [b0, b0+bn) chunked
    at _IGRP-group boundaries (segment starts need not be aligned)."""
    out = []
    b = b0
    while b < b0 + bn:
        grp = b // _IGRP
        u0 = b - grp * _IGRP
        u1 = min(_IGRP, u0 + (b0 + bn - b))
        out.append((grp, u0, u1))
        b = grp * _IGRP + u1
    return out


def _refine_flags_stream(tri, box_test, b0: int, bn: int):
    """EXACT per-lane refinement of the stream tier's interval-gate
    flags.  The gate alone is a conservative superset that scans
    ~1.4-1.7x the exact any-lane block union (host sim: 1.43x split
    gate at 262k; measured on chip at EQUAL 65k geometry: forced-stream
    1.70x slower than the exact-flag blocked tier,
    tools/diag_tier_gap.py).  The blocked tier trims the superset with
    per-block slab+prune tests against its SMEM-resident AABB table -
    which scales with the mesh and is exactly what the stream tier
    cannot hold.  Here the same tests run against a DMA-streamed slice:
    the (n_chunks, 8, rch) HBM table (rows 0-5 = box components, lane =
    block within chunk) is copied one chunk at a time into an
    (8, rch) SMEM scratch - SMEM stays constant in mesh size - and
    each gate-flagged block's six scalars feed the stacked ``box_test``;
    the any-lane flag rows land in flag_mat and ONE cross-lane max per
    128-block group writes the SEGMENT-LOCAL flag column (flags_v ->
    flags_s, one DMA per segment).  Chunks none of whose groups have a
    gate bit set skip their DMA and tests entirely (pl.when on the OR
    of the chunk's SMEM gate masks - scalar reads, no sync), so sparse
    tiles pay ~nothing.  _take_list then counts from the refined flags
    while still walking only gate-set groups: the scan DMAs exactly the
    blocks the sequential scan could hit, as in the blocked tier."""
    aabbT = tri["aabbT"]
    asmem = tri["asmem"]
    asem = tri["asem"]
    mat = tri["flag_mat"]
    flags_v = tri["flags_v"]
    flags_s = tri["flags_s"]
    iflags_s = tri["iflags_s"]
    segf = flags_v.shape[0]
    # every index below is SEGMENT-LOCAL; only the chunk DMA start adds
    # the (possibly TRACED - see _seg_loop) segment base b0.  The chunk
    # width is fixed at build time (min(_RCHUNK, _SEG), asmem's lane
    # extent - it can exceed segf when a forced-stream mesh has fewer
    # than _RCHUNK blocks; the table pads with NaN either way):
    # full-width DMAs into NaN padding keep hardware lane tiling happy,
    # and starts stay aligned because _SEG % _RCHUNK == 0 on hardware
    # geometry.
    rch = asmem.shape[1]
    # groups a skipped chunk covers keep this cleared value
    flags_v[...] = jnp.zeros((segf, 1), jnp.int32)
    for cl in range(0, bn, rch):
        cn = min(rch, bn - cl)
        act = None
        for gl in range(cl // _IGRP, -(-(cl + cn) // _IGRP)):
            a = iflags_s[0, gl]
            act = a if act is None else act | a

        def _chunk(cl=cl, cn=cn):
            # the AABB table is (n_chunks, 8, rch) in HBM and the chunk
            # is picked by a dynamic LEADING-dim index (b0 and cl are
            # multiples of rch by construction) - lane-dim dynamic
            # slicing is avoided (see _interval_union_flags)
            cp = pltpu.make_async_copy(
                aabbT.at[b0 // rch + cl // rch], asmem, asem)
            cp.start()
            cp.wait()
            for g in range(cl, cl + cn, 128):
                gn = min(128, cl + cn - g)
                mat[pl.ds(0, 128), :] = jnp.zeros((128, 128), jnp.int32)
                for gl in range(g // _IGRP, -(-(g + gn) // _IGRP)):
                    mask = iflags_s[0, gl]
                    u0 = max(0, g - gl * _IGRP)
                    u1 = min(_IGRP, g + gn - gl * _IGRP)
                    sel = (1 << u1) - (1 << u0)

                    def _blocks(gl=gl, u0=u0, u1=u1, mask=mask,
                                cl=cl, g=g):
                        for u in range(u0, u1):
                            bl = gl * _IGRP + u

                            def _one(bl=bl):
                                a6 = [asmem[j, bl - cl] for j in range(6)]
                                mat[pl.ds(bl - g, 1), :] = jnp.max(
                                    box_test(a6).astype(jnp.int32),
                                    axis=0, keepdims=True)

                            pl.when(((mask >> u) & 1) == 1)(_one)

                    pl.when((mask & sel) != 0)(_blocks)
                col = jnp.max(mat[...], axis=1, keepdims=True)
                wn = min(-(-gn // 8) * 8, segf - g)
                flags_v[pl.ds(g, wn), :] = col[:wn]

        pl.when(act != 0)(_chunk)
    cp = pltpu.make_async_copy(flags_v, flags_s, tri["fsem2"])
    cp.start()
    cp.wait()


def _flag_prepass(tri, box_test, bundles, neg_t: bool, b0=0, bn=None):
    """Interval-gated take-flag prepass over the block range [b0, b0+bn)
    (one scan segment; defaults to every block).  ``box_test(a6) ->
    (SUB, 128) bool`` runs the conservative per-lane slab+prune
    predicate (unioned over all the trace's bundles) against one AABB's
    six SMEM scalars; ``bundles`` carries the same bundles' raw
    origin/direction/t-bound vectors for the interval gate.

    The vector interval pass (_interval_union_flags) flags candidate
    blocks for ALL groups in a handful of vector ops; the exact per-lane
    tests - each costs ~0.8 us of SMEM-scalar->vector broadcasts - then
    run only inside ``pl.when(interval bit set)``, so the dominant
    linear-in-scene cost (n_blocks slab tests per bundle per trace,
    measured ~52 ps/path/block: the ENTIRE 1k->65k scaling loss before
    round 3's macro level, then still ~15 ms/frame at 65k with it)
    drops to ~taken-superset tests (~13/tile at 65k).  Exact-test rows
    land in the (128, 128) lane matrix; ONE cross-lane reduction per
    128-block group yields the (128, 1) flag column for the take-list
    build - so the final take-list stays the EXACT any-lane union (the
    interval superset would inflate block scans 2.3x at 65k).

    The flag DMAs copy the FULL padded arrays: Mosaic cannot slice a
    (N, 1) array's lane dim, rows outside the segment are never read,
    and the copies are <= 2 KB."""
    nb = tri["n_blocks"]
    if bn is None:
        bn = nb - b0

    if tri.get("stream"):
        # STREAM tier (> _MAX_BLOCKED_TRIANGLES): the gate bits land in
        # segment-local SMEM buffers (constant in mesh size), then the
        # exact per-lane tests trim the gate's conservative superset
        # against a DMA-streamed AABB chunk (_refine_flags_stream) -
        # without the refinement the superset costs 1.70x wall clock at
        # equal 65k geometry (tools/diag_tier_gap.py).  Correctness is
        # tier-independent: gate and refined flags are both supersets
        # of the blocks the sequential scan could hit.
        _interval_union_flags(tri, bundles, neg_t, b0=b0)
        if "aabbT" in tri:
            _refine_flags_stream(tri, box_test, b0, bn)
        return

    aabb_ref = tri["aabb"]
    mat = tri["flag_mat"]
    flags_v = tri["flags_v"]
    flags_s = tri["flags_s"]
    fsem = tri["fsem"]

    if tri["flat"]:
        # <= 2 interval groups: the gate cannot cull enough to pay for
        # its flag DMA + sync - run the flat single-level prepass
        # (flat meshes always scan in a single segment)
        assert b0 == 0 and bn == nb
        for g in range(0, nb, 128):
            gn = min(128, nb - g)
            if gn < 128:
                mat[pl.ds(0, 128), :] = jnp.zeros((128, 128), jnp.int32)
            for l in range(gn):
                a6 = [aabb_ref[g + l, j] for j in range(6)]
                mat[pl.ds(l, 1), :] = jnp.max(
                    box_test(a6).astype(jnp.int32), axis=0, keepdims=True)
            flags_v[pl.ds(g, 128), :] = jnp.max(mat[...], axis=1,
                                                keepdims=True)
        cp = pltpu.make_async_copy(flags_v, flags_s, fsem)
        cp.start()
        cp.wait()
        return

    _interval_union_flags(tri, bundles, neg_t)
    iflags_s = tri["iflags_s"]
    for g in range(b0, b0 + bn, 128):
        # gated writes may skip rows: clear the whole group first
        mat[pl.ds(0, 128), :] = jnp.zeros((128, 128), jnp.int32)
        gn = min(128, b0 + bn - g)
        for grp, u0, u1 in _group_chunks(g, gn):
            mask = iflags_s[0, grp]
            sel = (1 << u1) - (1 << u0)

            def _blocks(grp=grp, u0=u0, u1=u1, mask=mask):
                for u in range(u0, u1):
                    bb = grp * _IGRP + u

                    def _one(bb=bb):
                        a6 = [aabb_ref[bb, j] for j in range(6)]
                        mat[pl.ds(bb - g, 1), :] = jnp.max(
                            box_test(a6).astype(jnp.int32), axis=0,
                            keepdims=True)

                    pl.when(((mask >> u) & 1) == 1)(_one)

            pl.when((mask & sel) != 0)(_blocks)
        col = jnp.max(mat[...], axis=1, keepdims=True)
        wn = min(-(-gn // 8) * 8, flags_v.shape[0] - g)
        flags_v[pl.ds(g, wn), :] = col[:wn]
    cp = pltpu.make_async_copy(flags_v, flags_s, fsem)
    cp.start()
    cp.wait()


def _block_flags(tri, ox, oy, oz, dx, dy, dz, neg_t: bool, occ_tl, carry,
                 b0=0, bn=None):
    """Single-bundle take flags (closest-hit when ``occ_tl is None``,
    else occlusion with running occ mask in ``carry``): the conservative
    slab + t-prune predicate fed through the interval-gated
    _flag_prepass.  ``carry`` is the CURRENT running state, so
    per-segment calls re-prune with the t/occ the previous segments
    established."""
    one = np.float32(1.0)
    inv_dx, inv_dy, inv_dz = one / dx, one / dy, one / dz

    occ_gate = None if occ_tl is None else (carry == 0)

    def box_test(a6):
        if occ_tl is None:
            return _box_hit_closest(tuple(a6), (ox, oy, oz),
                                    (inv_dx, inv_dy, inv_dz),
                                    carry[0], carry[1], neg_t)
        return _box_hit_occ(tuple(a6), (ox, oy, oz),
                            (inv_dx, inv_dy, inv_dz),
                            occ_tl, occ_gate, neg_t)

    if occ_tl is None:
        thi = None if neg_t else carry[0] / carry[1]
        gate = None
    else:
        thi = None if neg_t else occ_tl
        gate = carry == 0
    bundle = {"o": (ox, oy, oz), "d": (dx, dy, dz), "thi": thi,
              "gate": gate}
    _flag_prepass(tri, box_test, [bundle], neg_t, b0, bn)


def _take_list(tri, b0=0, bn=None):
    """SMEM take-list build over the block range [b0, b0+bn) from the
    flag rows.  Flat meshes use the branch-free scalar form: every block
    id is written at the current count and the count advances only on
    taken blocks, so dead writes are overwritten by the next taken id
    (positions >= cnt are never read).  Gated meshes visit each
    _IGRP-group's blocks only under ``pl.when(interval mask hit)`` with
    the count carried in an SMEM cell - the scalar build was the
    dominant linear-in-scene cost before gating (n_blocks dependent
    scalar iterations per trace), and the interval mask (a superset of
    the exact flags, so no taken block is ever skipped) cuts it to
    n_groups checks + _IGRP x taken_groups iterations.  Returns the
    int32 count."""
    list_s = tri["list"]
    nb = tri["n_blocks"]
    if bn is None:
        bn = nb - b0
    if tri.get("stream"):
        # stream tier: walk the SEGMENT-LOCAL interval bit masks (column
        # gl covers blocks b0 + gl*_IGRP ...); list ids stay absolute.
        # bn is always a multiple of _IGRP (n_blocks pads to _MACRO and
        # film_super_mega asserts _MACRO % _IGRP == 0), so no group
        # straddles a segment boundary.  With the exact refinement the
        # count advances on the REFINED segment-local flags (a subset
        # of the gate bits, so gate-empty groups still skip safely);
        # without it the gate bits themselves count.  The fori segment
        # loop always runs bn = _SEG, so the FINAL segment's tail past
        # n_blocks holds phantom blocks: their NaN gate boxes keep the
        # masks zero for sign-constrained bundles, and the explicit
        # ``b < n_blocks`` guard below makes the count exact even for a
        # degenerate all-sign-mixed bundle half (a phantom id in the
        # list would DMA past tblT's extent - UB on hardware).
        iflags_s = tri["iflags_s"]
        cnt_s = tri["cnt"]
        rflags_s = tri.get("flags_s")
        cnt_s[0, 0] = jnp.int32(0)
        for gl in range(-(-bn // _IGRP)):
            mask = iflags_s[0, gl]

            def _blocks(gl=gl, mask=mask):
                c = cnt_s[0, 0]
                for u in range(_IGRP):
                    b = b0 + gl * _IGRP + u
                    # static segment bases walk exact bn (no phantom
                    # tail); only the traced fori path needs the guard
                    valid = (1 if isinstance(b, (int, np.integer))
                             else (b < nb).astype(jnp.int32))
                    list_s[0, c] = b
                    if rflags_s is None:
                        c = c + ((mask >> u) & 1) * valid
                    else:
                        c = c + rflags_s[gl * _IGRP + u, 0] * valid
                cnt_s[0, 0] = c

            pl.when(mask != 0)(_blocks)
        return cnt_s[0, 0]
    flags_s = tri["flags_s"]
    if tri["flat"]:
        cnt = jnp.int32(0)
        for b in range(b0, b0 + bn):   # straight-line scalar code: a
            list_s[0, cnt] = b         # fori here costs 1.1 us x blocks
            cnt = cnt + flags_s[b, 0]
        return cnt
    iflags_s = tri["iflags_s"]
    cnt_s = tri["cnt"]
    cnt_s[0, 0] = jnp.int32(0)
    for grp, u0, u1 in _group_chunks(b0, bn):
        mask = iflags_s[0, grp]
        sel = (1 << u1) - (1 << u0)

        def _blocks(grp=grp, u0=u0, u1=u1):
            c = cnt_s[0, 0]
            for u in range(u0, u1):
                b = grp * _IGRP + u
                list_s[0, c] = b
                c = c + flags_s[b, 0]
            cnt_s[0, 0] = c

        pl.when((mask & sel) != 0)(_blocks)
    return cnt_s[0, 0]


def _seg_loop(tri, seg_body, carry):
    """Run ``seg_body(b0, bn, carry) -> carry`` over the scan segments.

    The blocked tier and single-segment streams unroll statically (at
    most one segment).  Multi-segment STREAM scans trace ONE body inside
    a ``lax.fori_loop`` with the segment base ``b0`` as a traced int32 -
    the kernel program is O(1) in mesh size, where the former Python
    unroll grew it linearly (8 segment bodies at 1M triangles: compile
    ~26 min through the tunnel, ~80% of it Mosaic/XLA on the unrolled
    program - tools/diag_stream_compile.py, docs/PERF.md).  This is
    sound because every per-segment structure is already segment-size
    STATIC: gate columns are padded to full segments (NaN sentinel
    AABBs that keep phantom gate bits clear, plus an id < n_blocks
    count guard in _take_list), flag buffers are segment-local, and the only
    absolute indices - the gate-slice DMA start, the refine-chunk DMA
    start, and the take-list block ids - all accept traced offsets
    (Mosaic supports dynamic-start slices; list ids are scalar SMEM
    stores).  Per-segment re-pruning is unchanged: the carry (t/occ)
    threads through the fori exactly as it did through the unroll."""
    nb = tri["n_blocks"]
    if not tri.get("stream") or nb <= _SEG:
        for b0 in range(0, nb, _SEG):
            carry = seg_body(b0, min(_SEG, nb - b0), carry)
        return carry
    n_seg = -(-nb // _SEG)

    def body(s, carry):
        return seg_body(s * _SEG, _SEG, carry)

    return jax.lax.fori_loop(0, n_seg, body, carry)


def _tri_scan_blocked(tri, ox, oy, oz, dx, dy, dz, neg_t: bool, occ_tl,
                      carry, row_update):
    """Morton-blocked triangle scan, take-list form: a vector-only flag
    prepass (_block_flags) decides which 128-triangle blocks the bundle
    can touch, an interval-gated scalar loop compacts them into an SMEM
    take-list, and a dynamic-trip fori DMAs + row-scans EXACTLY the
    taken blocks - the hot loop has no slab tests, no cross-lane
    reductions and no conds.  Meshes beyond _SEG blocks run in SEGMENTS
    (near-to-far macro order): each segment's prepass re-prunes with
    the t/occ carry the previous segments established, so torus
    self-occlusion - invisible to a single static take-list - culls far
    geometry (see the _SEG comment for the measured overhead trade).
    Conservative tests (padded AABBs, slack on the t prune) mean culling
    never changes the result.  This is the TPU-native replacement for
    the reference's uniform-grid DDA
    (trianglegrid/pathtracer.ocl:157-198): per-lane cell walks gather at
    ~1 lane/cycle, while block constants broadcast to all 1024 lanes
    (docs/PERF.md "Large meshes")."""
    tbl_any = tri["tbl"]
    scratch = tri["scratch"]
    sem = tri["sem"]
    list_s = tri["list"]

    def scan(i, carry):
        b = list_s[0, i]
        cp = pltpu.make_async_copy(
            tbl_any.at[:, pl.ds(b * _TRI_BLOCK, _TRI_BLOCK)],
            scratch, sem)
        cp.start()
        cp.wait()

        def rows(i, c):
            for u in range(_TRI_UNROLL):
                rr = i * _TRI_UNROLL + u
                r = [scratch[j, rr] for j in range(13)]
                c = row_update(r, c)
            return c

        return _static_fori(_TRI_BLOCK // _TRI_UNROLL, rows, carry)

    def seg_body(b0, bn, carry):
        cnt = _prepass_take_gated(
            tri, b0, bn,
            lambda: _block_flags(tri, ox, oy, oz, dx, dy, dz, neg_t,
                                 occ_tl, carry, b0, bn))
        if _DIAG_SPLIT == "noscan":
            return carry
        return jax.lax.fori_loop(0, cnt, scan, carry)

    if _DIAG_SPLIT == "noblocks":
        return carry
    if "segiv" in tri:
        # entry-carry bundle for the segment pre-gate (sound for every
        # later segment: the carry only tightens - _segment_pregate)
        if occ_tl is None:
            thi0 = None if neg_t else carry[0] / carry[1]
            gate0 = None
        else:
            thi0 = None if neg_t else occ_tl
            gate0 = carry == 0
        _segment_pregate(tri, [{"o": (ox, oy, oz), "d": (dx, dy, dz),
                                "thi": thi0, "gate": gate0}], neg_t)
    return _seg_loop(tri, seg_body, carry)


def _closest_blocked_stacked(tri, so3, sd3, B: int, neg_t: bool, scar):
    """Shared blocked CLOSEST-HIT scan on ONE stacked (B*sub, 128)
    bundle array (bundle k = sublane rows [k*sub, (k+1)*sub)): per
    SEGMENT, one flag prepass computes the union take-list - each
    block's six AABB scalars are read once and slab+prune-tested
    against every bundle (per-bundle running bn/bd) - and one scan
    walks the union, sharing each block's DMA and 13 scalar row reads
    across all bundles.  Later segments re-prune with the bn/bd the
    earlier ones tightened (near-to-far order makes self-occlusion cull
    the far mesh).  Scanning a block one bundle did not need only
    re-tests rows against its strictly-closer running minimum - the
    result is identical (same closest-hit math, superset of rows).
    ``scar`` is the stacked blocked-mode carry
    (bn, bd, bi, m, nx, ny, nz, needs); returns it updated."""
    tbl_any = tri["tbl"]
    scratch = tri["scratch"]
    sem = tri["sem"]
    list_s = tri["list"]
    one = np.float32(1.0)
    sox, soy, soz = so3
    sdx, sdy, sdz = sd3
    sub = sox.shape[0] // B
    sinv = (one / sdx, one / sdy, one / sdz)

    def scan(i, scar):
        b = list_s[0, i]
        cp = pltpu.make_async_copy(
            tbl_any.at[:, pl.ds(b * _TRI_BLOCK, _TRI_BLOCK)],
            scratch, sem)
        cp.start()
        cp.wait()

        def rows(j, c):
            for u in range(_TRI_UNROLL):
                rr = j * _TRI_UNROLL + u
                r = [scratch[jj, rr] for jj in range(13)]
                c = _tri_closest_row_blocked(r, sox, soy, soz,
                                             sdx, sdy, sdz, neg_t, c)
            return c

        return _static_fori(_TRI_BLOCK // _TRI_UNROLL, rows, scar)

    def bsl(v, k):
        return v[k * sub:(k + 1) * sub]

    def seg_body(b0, bn, scar):
        def box_test(a6):
            # one stacked slab+prune; the flag row's cross-lane max
            # unions the bundles exactly as the per-ray OR did
            return _box_hit_closest(tuple(a6), (sox, soy, soz), sinv,
                                    scar[0], scar[1], neg_t)

        bundles = [{"o": tuple(bsl(v, k) for v in so3),
                    "d": tuple(bsl(v, k) for v in sd3),
                    "thi": None if neg_t else
                    bsl(scar[0], k) / bsl(scar[1], k),
                    "gate": None}
                   for k in range(B)]
        cnt = _prepass_take_gated(
            tri, b0, bn,
            lambda: _flag_prepass(tri, box_test, bundles, neg_t, b0, bn))
        if _DIAG_SPLIT == "noscan":
            return scar
        return jax.lax.fori_loop(0, cnt, scan, scar)

    if _DIAG_SPLIT == "noblocks":
        return scar
    if "segiv" in tri:
        # entry-carry bundles for the segment pre-gate (the per-bundle
        # bn/bd only tightens across segments - _segment_pregate)
        pre = [{"o": tuple(bsl(v, k) for v in so3),
                "d": tuple(bsl(v, k) for v in sd3),
                "thi": None if neg_t else
                bsl(scar[0], k) / bsl(scar[1], k),
                "gate": None}
               for k in range(B)]
        _segment_pregate(tri, pre, neg_t)
    return _seg_loop(tri, seg_body, scar)


def _pre_tri_state(ox, oy, oz, dx, dy, dz, scn_const, neg_t: bool,
                   t0=None):
    """Floor/squares/spheres closest-hit state before the triangle scan
    (literal-constant tests, cheap); returns the running carry."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    t = jnp.full(ox.shape, _BIG, jnp.float32) if t0 is None else t0
    m = jnp.zeros(ox.shape, jnp.int32)
    nx = jnp.zeros(ox.shape, jnp.float32)
    ny = jnp.zeros(ox.shape, jnp.float32)
    nz = jnp.zeros(ox.shape, jnp.float32)
    # loop-carried masks are int32: Mosaic cannot legalize scf.for with
    # vector<i1> carries ("failed to legalize operation 'scf.for'")
    needs = jnp.zeros(ox.shape, jnp.int32)
    inv_dz = one / dz

    # floor
    p = -oz * inv_dz
    hit = (p > _EPS) & (p < t)
    t = jnp.where(hit, p, t)
    m = jnp.where(hit, 1, m)
    nz = jnp.where(hit, one, nz)

    # squares (literal constants)
    for k, z in zip(scn_const["square_k"], scn_const["square_z"]):
        rd = (np.float32(z) - oz) * inv_dz
        ix = ox + dx * rd
        iy = oy + dy * rd
        ok = (rd < t) & (jnp.abs(np.float32(k) - ix) < 1.0) & (jnp.abs(iy) < 1.0)
        if not neg_t:
            ok = ok & (rd > _EPS)
        t = jnp.where(ok, rd, t)
        m = jnp.where(ok, 3, m)
        nx = jnp.where(ok, zero, nx)
        ny = jnp.where(ok, zero, ny)
        nz = jnp.where(ok, one, nz)
        needs = jnp.where(ok, 0, needs)

    # spheres (literal centers)
    for cx, cy, cz in scn_const["spheres"]:
        px, py, pz = ox - np.float32(cx), oy - np.float32(cy), oz - np.float32(cz)
        b = px * dx + py * dy + pz * dz
        cc = px * px + py * py + pz * pz - one
        q = b * b - cc
        s = -b - jnp.sqrt(jnp.maximum(q, zero))
        ok = (q > zero) & (s < t) & (s > _EPS)
        t = jnp.where(ok, s, t)
        m = jnp.where(ok, 3, m)
        nx = jnp.where(ok, px + dx * s, nx)
        ny = jnp.where(ok, py + dy * s, ny)
        nz = jnp.where(ok, pz + dz * s, nz)
        needs = jnp.where(ok, 1, needs)
    return t, m, nx, ny, nz, needs


def _post_tri_finalize(t, m, nx, ny, nz, needs):
    one = np.float32(1.0)
    inv_len = jnp.where(
        needs != 0,
        jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                  np.float32(1e-30))),
        one)
    return t, m, nx * inv_len, ny * inv_len, nz * inv_len


def _trace_kernel(tri, ox, oy, oz, dx, dy, dz, scn_const, neg_t: bool,
                  t0=None):
    """Closest-hit scan, semantics of ops/intersect.py::trace_ray with
    sphere_material=3.  Returns (t, m, nx, ny, nz) with sphere normals
    already normalised.  ``tri`` describes the triangle stage: mode
    "smem" (whole table resident, reference-scene sizes) or "blocked"
    (Morton blocks DMA-streamed behind AABB skips, large meshes).
    ``t0`` seeds the running distance (trace_ray's t_init - the lmem
    binaries' caller-initialised max distance)."""
    t, m, nx, ny, nz, needs = _pre_tri_state(ox, oy, oz, dx, dy, dz,
                                             scn_const, neg_t, t0)
    # triangles: division-free scan (running min carried as bn/bd)
    if tri["nt"]:
        if tri["mode"] == "smem":
            tbl_ref = tri["tbl"]
            carry = (t, jnp.ones_like(t), m, nx, ny, nz, needs)

            def tri_step(i, c):
                for u in range(_TRI_UNROLL):
                    row = i * _TRI_UNROLL + u
                    c = _tri_closest_row([tbl_ref[row, j] for j in range(12)],
                                         ox, oy, oz, dx, dy, dz, neg_t, c)
                return c

            ntp = -(-tri["nt"] // _TRI_UNROLL)
            carry = _static_fori(ntp, tri_step, carry)
            bn, bd, m, nx, ny, nz, needs = carry
        else:
            carry = (t, jnp.ones_like(t), jnp.full_like(t, -1.0),
                     m, nx, ny, nz, needs)

            def upd(r, c):
                return _tri_closest_row_blocked(r, ox, oy, oz, dx, dy, dz,
                                                neg_t, c)

            carry = _tri_scan_blocked(tri, ox, oy, oz, dx, dy, dz, neg_t,
                                      None, carry, upd)
            bn, bd, _, m, nx, ny, nz, needs = carry
        t = bn / bd
    return _post_tri_finalize(t, m, nx, ny, nz, needs)


def _trace_rays_stacked(tri, so3, sd3, scn_const, neg_t: bool):
    """Closest-hit scan on ONE stacked (B*sub, 128) ray array sharing a
    single pass over the SMEM triangle table (each row's 12 scalars read
    once, tested against every stacked bundle - e.g. the spp group's
    primary rays).  The floor/square/sphere pre-state and the finalize
    run as tall ops too - the per-sample fixed work is where the
    dependency-bound issue gap lives (docs/PERF.md round 3).  Returns
    tall (t, m, nx, ny, nz).  SMEM mode only; blocked (large-mesh)
    callers use _closest_blocked_stacked."""
    assert tri["nt"] == 0 or tri["mode"] == "smem"
    sox, soy, soz = so3
    sdx, sdy, sdz = sd3
    t, m, nx, ny, nz, needs = _pre_tri_state(sox, soy, soz, sdx, sdy, sdz,
                                             scn_const, neg_t)
    if tri["nt"]:
        tbl_ref = tri["tbl"]
        scar = (t, jnp.ones_like(t), m, nx, ny, nz, needs)

        def tri_step(i, c):
            for u in range(_TRI_UNROLL):
                row = i * _TRI_UNROLL + u
                r = [tbl_ref[row, j] for j in range(12)]
                c = _tri_closest_row(r, sox, soy, soz, sdx, sdy, sdz,
                                     neg_t, c)
            return c

        ntp = -(-tri["nt"] // _TRI_UNROLL)
        bn, bd, m, nx, ny, nz, needs = _static_fori(ntp, tri_step, scar)
        t = bn / bd
    return _post_tri_finalize(t, m, nx, ny, nz, needs)


def _trace_rays_shared(tri, rays, scn_const, neg_t: bool):
    """List-API wrapper over _trace_rays_stacked: stacks the bundles
    along sublanes, traces once, slices the results back.  Returns a
    list of (t, m, nx, ny, nz)."""
    B = len(rays)
    sub = rays[0][0][0].shape[0]
    so3 = tuple(jnp.concatenate([o3[c] for o3, _ in rays], axis=0)
                for c in range(3))
    sd3 = tuple(jnp.concatenate([d3[c] for _, d3 in rays], axis=0)
                for c in range(3))
    out = _trace_rays_stacked(tri, so3, sd3, scn_const, neg_t)
    return [tuple(v[k * sub:(k + 1) * sub] for v in out) for k in range(B)]


def _anchor_stacked(gbox, so3, sd3):
    """Per-lane ANCHORED origins for shadow interval-gate bundles.

    A shadow bundle's true origins are the tile's hit points - which
    include floor hits out to t ~ 1e6 near the horizon - so the bundle's
    origin hull spans the whole horizon and the interval gate passes
    essentially every block (measured: the 262k-triangle stream frame
    spent ~90% of its 3.1 s scanning shadow-union blocks).  All triangle
    geometry lives inside the padded global box ``gbox`` (a compile-time
    literal, the hull of the block AABBs), so each lane's origin can
    slide along its own ray to the box ENTRY point: the line set is
    unchanged, every true block crossing (at t >= EPS, inside the box)
    sits at anchored t' >= -(box-pad rounding), and the anchored origin
    hull is bounded by the box (~ the mesh size) instead of the horizon.
    Lanes whose rays MISS the padded box cannot hit any triangle (all
    triangles lie inside the unpadded hull), so they are masked out of
    the gate entirely (``keep``); lanes with non-finite slab results
    (origin exactly on a box plane - 0 * inf) conservatively keep their
    true origin and stay gated.

    Returns (anchored stacked origins, stacked keep mask) - the math is
    elementwise, so it runs on the tall stacked arrays directly."""
    zero = np.float32(0.0)
    one = np.float32(1.0)
    (ox, oy, oz), (dx, dy, dz) = so3, sd3
    inv = (one / dx, one / dy, one / dz)
    tmin, tmax = _slab(gbox, ox, oy, oz, *inv)
    finite = (jnp.abs(tmin) < _BIGF) & (jnp.abs(tmax) < _BIGF)
    miss = finite & ((tmax < tmin) | (tmax < zero))
    s0 = jnp.where(finite & ~miss, jnp.maximum(tmin, zero), zero)
    return (ox + s0 * dx, oy + s0 * dy, oz + s0 * dz), ~miss


def _occ_blocked_stacked(tri, so3, sd3, stl, B: int, neg_t: bool, socc,
                         srel):
    """Shared blocked occlusion scan on ONE stacked (B*sub, 128) bundle
    array: per SEGMENT, one flag prepass computes the UNION take-list
    over all (sample, light) shadow bundles - each block's six AABB
    scalars are read once and slab-tested against every ray - and one
    scan walks the union list, sharing each block's DMA and 9 scalar
    row reads across all rays (VERDICT round 2 task 7).  Rays a segment
    occludes drop out of the next segment's union (gates re-derive from
    the running ``socc``).

    ``srel`` (or None) masks lanes whose occlusion cannot change the
    image out of the prepass: sky and facing-ratio hits ignore the
    illumination term entirely, and back-facing lights (lamb < 0) zero
    it regardless of occlusion.  This matters enormously: a sky lane's
    shadow origin is x = o + d * 1e9, and the line from there toward a
    light crosses MANY block AABBs - unmasked, sky tiles scan most of
    the mesh for shadow rays whose result is discarded (measured 110 of
    179 ms/frame on the 20k-torus at 256^2, docs/PERF.md round 3)."""
    tbl_any = tri["tbl"]
    scratch = tri["scratch"]
    sem = tri["sem"]
    list_s = tri["list"]
    one = np.float32(1.0)
    sox, soy, soz = so3
    sdx, sdy, sdz = sd3
    sub = sox.shape[0] // B
    sinv = (one / sdx, one / sdy, one / sdz)

    def scan(i, socc):
        b = list_s[0, i]
        cp = pltpu.make_async_copy(
            tbl_any.at[:, pl.ds(b * _TRI_BLOCK, _TRI_BLOCK)],
            scratch, sem)
        cp.start()
        cp.wait()

        def rows(j, occ):
            for u in range(_TRI_UNROLL):
                rr = j * _TRI_UNROLL + u
                r = [scratch[jj, rr] for jj in range(9)]
                occ = _tri_occ_row(r, sox, soy, soz, sdx, sdy, sdz,
                                   neg_t, stl, occ)
            return occ

        return _static_fori(_TRI_BLOCK // _TRI_UNROLL, rows, socc)

    sanch, skeep = _anchor_stacked(tri["gbox"], so3, sd3)
    if srel is not None:
        skeep = skeep & srel
    diag = max(tri["gbox"][c + 3] - tri["gbox"][c] for c in range(3))
    tlo = -(0.01 + 1e-3 * diag)

    def bsl(v, k):
        return v[k * sub:(k + 1) * sub]

    def seg_body(b0, bn, socc):
        # gates re-derive from the CURRENT occs: rays occluded by an
        # earlier segment drop out of this segment's union entirely;
        # rays missing the global triangle box (or masked image-
        # irrelevant) never enter it at all
        sgate = (socc == 0) & skeep

        def box_test(a6):
            return _box_hit_occ(tuple(a6), (sox, soy, soz), sinv, stl,
                                sgate, neg_t)

        bundles = [{"o": tuple(bsl(v, k) for v in sanch),
                    "d": tuple(bsl(v, k) for v in sd3),
                    "thi": None if neg_t else
                    (stl if isinstance(stl, np.floating) else bsl(stl, k)),
                    "gate": bsl(sgate, k), "tlo": tlo}
                   for k in range(B)]
        cnt = _prepass_take_gated(
            tri, b0, bn,
            lambda: _flag_prepass(tri, box_test, bundles, neg_t, b0, bn))
        if _DIAG_SPLIT == "noscan":
            return socc
        return jax.lax.fori_loop(0, cnt, scan, socc)

    if _DIAG_SPLIT == "noblocks":
        return socc
    if "segiv" in tri:
        # entry-state bundles for the segment pre-gate (gates only
        # SHRINK as segments occlude rays - _segment_pregate)
        sgate0 = (socc == 0) & skeep
        pre = [{"o": tuple(bsl(v, k) for v in sanch),
                "d": tuple(bsl(v, k) for v in sd3),
                "thi": None if neg_t else
                (stl if isinstance(stl, np.floating) else bsl(stl, k)),
                "gate": bsl(sgate0, k), "tlo": tlo}
               for k in range(B)]
        _segment_pregate(tri, pre, neg_t)
    return _seg_loop(tri, seg_body, socc)


def _occluded_rays_stacked(tri, so3, sd3, stl, B: int, scn_const,
                           neg_t: bool, srel=None):
    """Occlusion scan on ONE stacked (B*sub, 128) bundle array (one
    bundle per (sample, light) pair), sharing a single pass over the
    triangle table: each SMEM row is read once and tested against every
    ray, dividing the scalar reads and loop overhead of the dominant
    stage by the ray count - and the floor/square/sphere prepass runs
    as tall ops too.  ``stl`` is the shadow t bound (np.float32 scalar
    or a stacked array); semantics per lane == _occluded_kernel.  In
    blocked (large-mesh) mode the rays share one union take-list scan
    (_occ_blocked_stacked), with ``srel`` masking image-irrelevant
    lanes out of the block cull (their occ value may then be stale-0,
    which shading ignores).  Returns the tall occ array."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    sox, soy, soz = so3
    sdx, sdy, sdz = sd3
    inv_dz = one / sdz
    p = -soz * inv_dz
    occ = ((p > _EPS) & (p < stl)).astype(jnp.int32)
    for kk, z in zip(scn_const["square_k"], scn_const["square_z"]):
        rd = (np.float32(z) - soz) * inv_dz
        ix = sox + sdx * rd
        iy = soy + sdy * rd
        ok = ((rd < stl) & (jnp.abs(np.float32(kk) - ix) < 1.0)
              & (jnp.abs(iy) < 1.0))
        if not neg_t:
            ok = ok & (rd > _EPS)
        occ = jnp.where(ok, 1, occ)
    for cx, cy, cz in scn_const["spheres"]:
        px = sox - np.float32(cx)
        py = soy - np.float32(cy)
        pz = soz - np.float32(cz)
        b = px * sdx + py * sdy + pz * sdz
        cc = px * px + py * py + pz * pz - one
        q = b * b - cc
        s = -b - jnp.sqrt(jnp.maximum(q, zero))
        occ = jnp.where((q > zero) & (s < stl) & (s > _EPS), 1, occ)
    if tri["nt"] and tri["mode"] == "smem":
        tbl_ref = tri["tbl"]

        def tri_step(i, occ):
            for u in range(_TRI_UNROLL):
                row = i * _TRI_UNROLL + u
                r = [tbl_ref[row, j] for j in range(9)]
                occ = _tri_occ_row(r, sox, soy, soz, sdx, sdy, sdz,
                                   neg_t, stl, occ)
            return occ

        ntp = -(-tri["nt"] // _TRI_UNROLL)
        occ = _static_fori(ntp, tri_step, occ)
    if tri["nt"] and tri["mode"] != "smem":
        # blocked mode: union take-list shared across all rays
        occ = _occ_blocked_stacked(tri, so3, sd3, stl, B, neg_t, occ,
                                   srel)
    return occ


def _occluded_rays_shared(tri, rays, scn_const, neg_t: bool,
                          relevants=None):
    """List-API wrapper over _occluded_rays_stacked: ``rays`` is a list
    of (origin3, dir3, tl-or-None) bundles, stacked along sublanes and
    sliced back (identical per-lane math, B x fewer traced eqns)."""
    if not rays:
        return []   # 0-light scenes: no shadow bundles, no scan
    rays = [(o3, d3, _BIG if tl is None else tl) for o3, d3, tl in rays]
    B = len(rays)
    sub = rays[0][0][0].shape[0]
    so3 = tuple(jnp.concatenate([o3[c] for o3, _, _ in rays], axis=0)
                for c in range(3))
    sd3 = tuple(jnp.concatenate([d3[c] for _, d3, _ in rays], axis=0)
                for c in range(3))
    tls = [tl for _, _, tl in rays]
    if all(isinstance(tl, (float, np.floating)) and float(tl) == float(tls[0])
           for tl in tls):
        stl = np.float32(tls[0])
    else:
        stl = jnp.concatenate(
            [jnp.broadcast_to(tl, rays[k][0][0].shape)
             for k, tl in enumerate(tls)], axis=0)
    srel = None
    if relevants is not None and any(r is not None for r in relevants):
        srel = jnp.concatenate(
            [jnp.ones(rays[k][0][0].shape, jnp.bool_) if r is None else r
             for k, r in enumerate(relevants)], axis=0)
    occ = _occluded_rays_stacked(tri, so3, sd3, stl, B, scn_const, neg_t,
                                 srel)
    return [occ[k * sub:(k + 1) * sub] for k in range(B)]


def _occluded_kernel_multi(tri, ox, oy, oz, dirs, scn_const, neg_t: bool,
                           tls, relevants=None):
    """Shared-origin wrapper over _occluded_rays_shared (one shadow ray
    per light from one shading point)."""
    return _occluded_rays_shared(
        tri, [((ox, oy, oz), d3, tl) for d3, tl in zip(dirs, tls)],
        scn_const, neg_t, relevants=relevants)


def _primary_rays_k(ii, jj, r1, r2, r3, r4):
    """Thin-lens primary rays on (SUB, 128) vregs - the in-kernel twin of
    core/camera.py::primary_rays (pathtracer.ocl:232-237)."""
    cam = make_camera(z_sign=-1.0)
    upx, upy, upz = (np.float32(v) for v in cam.up)
    rix, riy, riz = (np.float32(v) for v in cam.right)
    eyx, eyy, eyz = (np.float32(v) for v in cam.eye_offset)
    psx, psy, psz = (np.float32(v) for v in cam.pos)
    e1 = (r1 - np.float32(0.5)) * np.float32(99.0)
    e2 = (r2 - np.float32(0.5)) * np.float32(99.0)
    dlx = upx * e1 + rix * e2
    dly = upy * e1 + riy * e2
    dlz = upz * e1 + riz * e2
    ox, oy, oz = psx + dlx, psy + dly, psz + dlz
    fs = np.float32(16.0)
    ax = r3 + ii
    ay = jj + r4
    dx = -dlx + (upx * ax + rix * ay + eyx) * fs
    dy = -dly + (upy * ax + riy * ay + eyy) * fs
    dz = -dlz + (upz * ax + riz * ay + eyz) * fs
    inv_n = np.float32(1.0) / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return ox, oy, oz, dx * inv_n, dy * inv_n, dz * inv_n


_primary_rays_k = jax.jit(_primary_rays_k)


def _shade_rgb(m, x, y, dx, dy, dz, nx, ny, nz, ti):
    """4-material per-sample RGB on vregs (models/super.py::sample_super
    epilogue; mirror branch dead on the covered family)."""
    one = np.float32(1.0)
    skyf = one - dz
    sky2 = skyf * skyf
    sky4 = sky2 * sky2
    ipx = x * np.float32(0.2)
    ipy = y * np.float32(0.2)
    sel = (jnp.ceil(ipx) + jnp.ceil(ipy)).astype(jnp.int32) & 1
    red = sel == 1
    facing = jnp.maximum(np.float32(0.0), -(nx * dx + ny * dy + nz * dz))

    is_sky = m == 0
    is_floor = m == 1
    is_diff = m == 3
    is_face = m == 4

    def shade(sky_c, floor_red, floor_white, diff_c):
        v = jnp.where(is_sky, np.float32(sky_c) * sky4, np.float32(0.0))
        fl = jnp.where(red, np.float32(floor_red), np.float32(floor_white))
        v = jnp.where(is_floor, fl * ti, v)
        v = jnp.where(is_diff, np.float32(diff_c) * ti, v)
        return jnp.where(is_face, facing, v)

    return (shade(C.SKY[0], C.FLOOR_RED[0], C.FLOOR_WHITE[0], C.DIFFUSE[0]),
            shade(C.SKY[1], C.FLOOR_RED[1], C.FLOOR_WHITE[1], C.DIFFUSE[1]),
            shade(C.SKY[2], C.FLOOR_RED[2], C.FLOOR_WHITE[2], C.DIFFUSE[2]))


_shade_rgb = jax.jit(_shade_rgb)


def _mega_kernel(scalars_ref, *refs, width: int, spp: int,
                 scn_const, neg_t: bool, nt: int, n_blocks: int = 0,
                 carry_t: bool = False, stream: bool = False,
                 stream_refine: bool = False, gbox=None):
    if n_blocks and stream:
        # single-segment streams (n_blocks <= _SEG) keep the gate table
        # VMEM-resident and carry no aiv_v/aivsem scratch - the ref
        # layout is derived from n_blocks, mirroring film_super_mega
        it = list(refs)
        aabb_iv, tbl_any = it.pop(0), it.pop(0)
        aabbT = it.pop(0) if stream_refine else None
        segiv = it.pop(0) if n_blocks > _SEG else None
        out_ref, scratch, sem, iflags_v, iflags_s, fsem, list_s, \
            cnt_s = it[:8]
        it = it[8:]
        tri = {"mode": "blocked", "stream": True, "nt": nt,
               "aabb_iv": aabb_iv, "tbl": tbl_any, "scratch": scratch,
               "sem": sem, "n_blocks": n_blocks, "flat": False,
               "iflags_v": iflags_v, "iflags_s": iflags_s, "fsem": fsem,
               "list": list_s, "cnt": cnt_s, "gbox": gbox}
        if n_blocks > _SEG:
            aiv_v, aivsem = it[:2]
            it = it[2:]
            tri.update(aiv_v=aiv_v, aivsem=aivsem)
        if stream_refine:
            asmem, asem, flag_mat, flags_v, flags_s, fsem2 = it[:6]
            it = it[6:]
            tri.update(aabbT=aabbT, asmem=asmem, asem=asem,
                       flag_mat=flag_mat, flags_v=flags_v,
                       flags_s=flags_s, fsem2=fsem2)
        if n_blocks > _SEG:
            # segment pre-gate table + mask buffers (round 5:
            # _segment_pregate; multi-segment streams only)
            segm_v, segm_s, segsem = it
            tri.update(segiv=segiv, segm_v=segm_v, segm_s=segm_s,
                       segsem=segsem)
    elif n_blocks:
        it = list(refs)
        aabb_ref, aabb_iv, tbl_any = it[:3]
        it = it[3:]
        segiv = it.pop(0) if n_blocks > _SEG else None
        out_ref, scratch, sem, flag_mat, flags_v, flags_s, list_s, \
            fsem, iflags_v, iflags_s, cnt_s = it[:11]
        it = it[11:]
        tri = {"mode": "blocked", "nt": nt, "aabb": aabb_ref,
               "aabb_iv": aabb_iv, "tbl": tbl_any, "scratch": scratch,
               "sem": sem, "n_blocks": n_blocks,
               "flat": n_blocks <= 2 * _IGRP, "flag_mat": flag_mat,
               "flags_v": flags_v, "flags_s": flags_s, "list": list_s,
               "fsem": fsem, "iflags_v": iflags_v, "iflags_s": iflags_s,
               "cnt": cnt_s, "gbox": gbox}
        if n_blocks > _SEG:
            # segmented BLOCKED scans (an experimental _SEG below the
            # 1024 production setting) get the segment pre-gate too
            segm_v, segm_s, segsem = it
            tri.update(segiv=segiv, segm_v=segm_v, segm_s=segm_s,
                       segsem=segsem)
    else:
        tbl_ref, out_ref = refs
        tri = {"mode": "smem", "nt": nt, "tbl": tbl_ref}
    # spp-group size is tier-dependent (see the constants' sweep notes)
    grp = _SPP_GROUP if tri["mode"] == "smem" else _SPP_GROUP_BLOCKED
    k0 = scalars_ref[0, 0]
    k1 = scalars_ref[0, 1]
    spp_offset = scalars_ref[0, 2]
    spp_total = scalars_ref[0, 3]
    row_offset = scalars_ref[0, 4]

    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 0)
    # all pixel math in int32 (Mosaic has no uint32->f32 casts); the ray id
    # switches to uint32 via bitcast - int32 wraparound is bit-identical
    w = np.int32(width)
    if n_blocks:
        # blocked mode: compact 2-D pixel tiles (ghost pixels beyond the
        # image edge render harmlessly and are dropped at reassembly)
        tiles_x = -(-width // _TW)
        tx = tile % np.int32(tiles_x)
        ty = tile // np.int32(tiles_x)
        idx = sub * 128 + lane
        ii_i = tx * np.int32(_TW) + idx % np.int32(_TW)
        jj_row = ty * np.int32(_TH) + idx // np.int32(_TW)
    else:
        p_local = tile * _TILE + sub * 128 + lane
        ii_i = p_local % w
        jj_row = p_local // w
    row_off_i = row_offset.astype(jnp.int32)
    ii = ii_i.astype(jnp.float32)
    jj = (jj_row + row_off_i).astype(jnp.float32)
    pixel_index = ((jj_row + row_off_i) * w + ii_i).astype(_U32)
    one = np.float32(1.0)

    lights = scn_const["lights"]

    def sample_body(s, acc):
        fr, fg, fb = acc
        s32 = s.astype(_U32) + spp_offset
        ray_id = pixel_index * spp_total + s32

        # camera draws: site 0, counters 0 and 1 (core/rng.py randn_draws)
        b0, b1 = _threefry(k0, k1, ray_id, jnp.zeros_like(ray_id))
        b2, b3 = _threefry(k0, k1, ray_id, jnp.ones_like(ray_id))
        r1, r2, r3, r4 = _unit(b0), _unit(b1), _unit(b2), _unit(b3)

        ox, oy, oz, dx, dy, dz = _primary_rays_k(ii, jj, r1, r2, r3, r4)

        t, m, nx, ny, nz = _trace_kernel(tri, ox, oy, oz, dx, dy, dz,
                                         scn_const, neg_t)
        x = ox + dx * t
        y = oy + dy * t
        z = oz + dz * t

        # direct lighting: jittered shadow ray per light (site 2 + i).
        # carry_t (the _lmem binaries' `&t` aliasing, lmem ocl:178):
        # sequential seeded closest-hit traces - each starts from the
        # carried distance (the primary hit's t, then each executed
        # trace's result) and a hit closer than the carry occludes
        # (models/super.py::illum_direct carry branch).
        ti = jnp.zeros_like(t)
        t_run = t
        ldirs = []
        lambs = []
        for i, (lx, ly, lz, li) in enumerate(lights):
            site = np.uint32((C.SITE_LIGHT0 + i) * 8)
            u0, u1 = _threefry(k0, k1, ray_id, jnp.full_like(ray_id, site))
            u1f, u2f = _unit(u0), _unit(u1)
            ldx = np.float32(lx) + u1f - x
            ldy = np.float32(ly) + u2f - y
            ldz = np.float32(lz) - z
            ldirs.append(_normalize3(ldx, ldy, ldz))
            lambs.append(ldirs[-1][0] * nx + ldirs[-1][1] * ny
                         + ldirs[-1][2] * nz)
        if carry_t:
            occs = []
            for (ldx, ldy, ldz), lamb in zip(ldirs, lambs):
                ts, ms, _, _, _ = _trace_kernel(tri, x, y, z, ldx, ldy, ldz,
                                                scn_const, neg_t, t0=t_run)
                occs.append(ms)
                t_run = jnp.where(lamb < 0, t_run, ts)
        else:
            # one shared pass over the triangle table for ALL lights'
            # shadow rays (each SMEM row read once).  Only floor/diffuse
            # hits with a front-facing light consume the occlusion result
            # (_shade_rgb: sky and facing-ratio ignore ti; lamb < 0 zeroes
            # the contribution) - the mask feeds the blocked-mode cull.
            base_rel = (m == 1) | (m == 3)
            rel = [base_rel & (lamb >= 0) for lamb in lambs]
            occs = _occluded_kernel_multi(tri, x, y, z, ldirs, scn_const,
                                          neg_t, [None] * len(ldirs),
                                          relevants=rel)
        for (lx, ly, lz, li), lamb, occ in zip(lights, lambs, occs):
            dqx = np.float32(lx) - x
            dqy = np.float32(ly) - y
            dqz = np.float32(lz) - z
            dist2 = dqx * dqx + dqy * dqy + dqz * dqz
            contrib = jnp.where(
                (lamb < 0) | (occ != 0), np.float32(0.0),
                lamb * jnp.minimum(np.float32(li) / dist2, one))
            ti = ti + contrib
        ti = jnp.minimum(ti, one) * np.float32(0.25)

        # shading (models/super.py::sample_super step; divFact == 1)
        sr, sg, sb = _shade_rgb(m, x, y, dx, dy, dz, nx, ny, nz, ti)
        return fr + sr, fg + sg, fb + sb

    def sample_group_body(pair, acc):
        """_SPP_GROUP spp samples per iteration, STACKED along sublanes:
        sample j occupies rows [j*_SUB, (j+1)*_SUB) of tall
        (G*_SUB, 128) arrays, so RNG, camera, pre-trace state, shadow
        setup and shading each run as ONE tall op per math line instead
        of G (and per light instead of G*nlights) - identical per-lane
        math, G x fewer traced eqns AND G independent vregs per issue
        for the dependency-chain-bound fixed work (docs/PERF.md round 3
        occupancy fit).  The primary scans share one pass over the
        triangle table (one union take-list in blocked mode), and all
        G x nlights shadow rays - stacked light-major on top - share
        another.  Film accumulation slices back in (s0, s1, ...) order,
        so the image is bit-identical to the single-sample loop."""
        G = grp
        fr, fg, fb = acc
        rid = jnp.concatenate(
            [pixel_index * spp_total
             + ((pair * G + j).astype(_U32) + spp_offset)
             for j in range(G)], axis=0)

        # camera draws: site 0, counters 0 and 1 (core/rng.py randn_draws)
        b0, b1 = _threefry(k0, k1, rid, jnp.zeros_like(rid))
        b2, b3 = _threefry(k0, k1, rid, jnp.ones_like(rid))
        r1, r2, r3, r4 = _unit(b0), _unit(b1), _unit(b2), _unit(b3)
        iiT = jnp.concatenate([ii] * G, axis=0)
        jjT = jnp.concatenate([jj] * G, axis=0)
        ox, oy, oz, dx, dy, dz = _primary_rays_k(iiT, jjT, r1, r2, r3, r4)

        if tri["nt"] and tri["mode"] != "smem":
            t, m, nx, ny, nz, needs = _pre_tri_state(
                ox, oy, oz, dx, dy, dz, scn_const, neg_t)
            scar = (t, jnp.ones_like(t), jnp.full_like(t, -1.0),
                    m, nx, ny, nz, needs)
            scar = _closest_blocked_stacked(
                tri, (ox, oy, oz), (dx, dy, dz), G, neg_t, scar)
            bn, bd, _, m, nx, ny, nz, needs = scar
            t, m, nx, ny, nz = _post_tri_finalize(bn / bd, m, nx, ny, nz,
                                                  needs)
        else:
            t, m, nx, ny, nz = _trace_rays_stacked(
                tri, (ox, oy, oz), (dx, dy, dz), scn_const, neg_t)
        x = ox + dx * t
        y = oy + dy * t
        z = oz + dz * t

        # shadow bundles: per light, jitter + direction math on the tall
        # sample array (light coords stay scalar constants); the
        # occlusion scan stacks the lights on top - bundle (i, j) is
        # rows [(i*G + j)*_SUB, ...) of a (nlights*G*_SUB, 128) array.
        # Only floor/diffuse hits with a front-facing light consume the
        # occlusion result (_shade_rgb: sky and facing-ratio ignore ti;
        # lamb < 0 zeroes the contribution) - the mask feeds the
        # blocked-mode cull.
        L = len(lights)
        base_rel = (m == 1) | (m == 3)
        sh_d = []
        lambs = []
        rels = []
        for i, (lx, ly, lz, li) in enumerate(lights):
            site = np.uint32((C.SITE_LIGHT0 + i) * 8)
            u0, u1 = _threefry(k0, k1, rid, jnp.full_like(rid, site))
            u1f, u2f = _unit(u0), _unit(u1)
            ldx = np.float32(lx) + u1f - x
            ldy = np.float32(ly) + u2f - y
            ldz = np.float32(lz) - z
            d3 = _normalize3(ldx, ldy, ldz)
            sh_d.append(d3)
            lambs.append(d3[0] * nx + d3[1] * ny + d3[2] * nz)
            rels.append(base_rel & (lambs[-1] >= 0))
        if L:
            so3 = tuple(jnp.concatenate([v] * L, axis=0) for v in (x, y, z))
            sd3 = tuple(jnp.concatenate([d[c] for d in sh_d], axis=0)
                        for c in range(3))
            srel = (jnp.concatenate(rels, axis=0)
                    if tri["nt"] and tri["mode"] != "smem" else None)
            occ = _occluded_rays_stacked(tri, so3, sd3, np.float32(_BIG),
                                         L * G, scn_const, neg_t, srel)

        # illumination + shading on the tall sample array; ti accumulates
        # in light order (same per-lane float order as the single-sample
        # loop), then the film slices back in (s0, s1, ...) order.
        GS = G * _SUB
        ti = jnp.zeros_like(t)
        for i, (lx, ly, lz, li) in enumerate(lights):
            lamb = lambs[i]
            dqx = np.float32(lx) - x
            dqy = np.float32(ly) - y
            dqz = np.float32(lz) - z
            dist2 = dqx * dqx + dqy * dqy + dqz * dqz
            ti = ti + jnp.where(
                (lamb < 0) | (occ[i * GS:(i + 1) * GS] != 0),
                np.float32(0.0),
                lamb * jnp.minimum(np.float32(li) / dist2, one))
        ti = jnp.minimum(ti, one) * np.float32(0.25)
        sr, sg, sb = _shade_rgb(m, x, y, dx, dy, dz, nx, ny, nz, ti)
        for j in range(G):
            sl = slice(j * _SUB, (j + 1) * _SUB)
            fr, fg, fb = fr + sr[sl], fg + sg[sl], fb + sb[sl]
        return fr, fg, fb

    zero = jnp.zeros((_SUB, 128), jnp.float32)
    acc = (zero, zero, zero)
    # grouped iterations divide the blocked tiers' prepass/take-list/DMA
    # work by the rays sharing each pass (G=2 measured fastest there);
    # the SMEM tier runs ungrouped (G=1: vreg pressure beats the shared
    # row reads post-stacking - see the constants' sweep notes).
    # carry_t stays sequential (its traces are dependent).
    if not carry_t and spp >= grp:
        acc = jax.lax.fori_loop(0, spp // grp, sample_group_body, acc)
        for tail_s in range((spp // grp) * grp, spp):
            acc = sample_body(jnp.int32(tail_s), acc)
    else:
        acc = jax.lax.fori_loop(0, spp, sample_body, acc)
    fr, fg, fb = acc
    out_ref[pl.ds(0, _SUB), :] = fr * C.EXPOSURE
    out_ref[pl.ds(_SUB, _SUB), :] = fg * C.EXPOSURE
    out_ref[pl.ds(2 * _SUB, _SUB), :] = fb * C.EXPOSURE


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 10 bits of x two apart (Morton interleave helper)."""
    x = x.astype(np.uint64) & np.uint64(0x3FF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def _tri_blocks(scn):
    """Host-side build of the blocked triangle tables (numpy, scene is a
    compile-time constant): sort triangles along a 30-bit Morton curve of
    their centroids so each 128-row block is spatially compact, then take
    per-block AABBs (padded by 0.1% + 1e-4 so float slab arithmetic stays
    conservative).  Returns (tblT (16, ntp) - transposed for 128-aligned
    DMA lane slices, rows padded to the f32 sublane tile - and
    aabbs (n_blocks, 6) as (lo, hi); padding blocks get a NaN box - an
    INVERTED (+big, -big) box passes both the slab and interval forms,
    which compute [min, max] over the two plane candidates, while NaN
    propagates through min/max and fails every >= comparison, so padded
    blocks are culled by every tier's prepass at zero kernel cost)."""
    from .intersect import _tri_table
    tbl = _tri_table(scn)
    nt = tbl.shape[0]
    v0 = tbl[:, 0:3]
    v1 = v0 + tbl[:, 3:6]
    v2 = v0 + tbl[:, 6:9]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    c = 0.5 * (lo + hi)
    smin = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - smin, 1e-30)
    q = np.clip((c - smin) / ext * 1023.0, 0.0, 1023.0).astype(np.uint64)
    code = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << np.uint64(1))
            | (_part1by2(q[:, 2]) << np.uint64(2)))
    order = np.argsort(code, kind="stable")
    tbl, lo, hi = tbl[order], lo[order], hi[order]

    # block count padded to full macros so every macro AABB encloses
    # exactly _MACRO block AABBs (padding blocks are NaN boxes that fail
    # every slab/interval test + det==0 rows - never flagged, never hit)
    n_blocks = -(-nt // _TRI_BLOCK)
    n_blocks = -(-n_blocks // _MACRO) * _MACRO
    ntp = n_blocks * _TRI_BLOCK
    big = np.float32(3e38)
    aabbs = np.empty((n_blocks, 6), np.float32)
    for b in range(n_blocks):
        s, e = b * _TRI_BLOCK, min((b + 1) * _TRI_BLOCK, nt)
        if s >= nt:
            aabbs[b, :] = np.nan
        else:
            blo = lo[s:e].min(axis=0)
            bhi = hi[s:e].max(axis=0)
            pad = 1e-3 * (bhi - blo) + 1e-4
            aabbs[b, :3] = blo - pad
            aabbs[b, 3:] = bhi + pad

    # macros group _MACRO MORTON-consecutive blocks (spatially compact,
    # so the enclosing macro AABB stays tight); macros - not individual
    # blocks - are then ordered near-to-far from the (fixed) camera.
    # The scan itself is order-independent (take-lists are built before
    # any row runs, and the closest-hit tie-break is by original index),
    # so the ordering choice only shapes AABB tightness.
    n_macros = n_blocks // _MACRO
    aabbs_m = np.empty((n_macros, 6), np.float32)
    for m in range(n_macros):
        grp = aabbs[m * _MACRO:(m + 1) * _MACRO]
        nonempty = grp[:, 0] <= grp[:, 3]
        if not nonempty.any():
            aabbs_m[m, :3], aabbs_m[m, 3:] = big, -big
        else:
            aabbs_m[m, :3] = grp[nonempty, :3].min(axis=0)
            aabbs_m[m, 3:] = grp[nonempty, 3:].max(axis=0)
    campos = np.asarray(make_camera(z_sign=-1.0).pos, np.float32)
    cdist = np.linalg.norm(
        np.clip(campos, aabbs_m[:, :3],
                np.maximum(aabbs_m[:, 3:], aabbs_m[:, :3])) - campos,
        axis=-1)
    cdist[aabbs_m[:, 0] > aabbs_m[:, 3]] = np.inf  # empty macros last
    morder = np.argsort(cdist, kind="stable")
    aabbs_m = aabbs_m[morder]
    border = (morder[:, None] * _MACRO
              + np.arange(_MACRO)[None, :]).ravel()
    aabbs = aabbs[border]

    # row 12 carries each triangle's ORIGINAL index (exact in f32 below
    # 2^24) for the blocked scan's tie-break; padded rows: det==0 + idx big
    tblT = np.zeros((16, ntp), np.float32)
    tblT[12, :] = np.float32(2 ** 24)
    for newb, oldb in enumerate(border):
        s = oldb * _TRI_BLOCK
        e = min(s + _TRI_BLOCK, nt)
        if s >= nt:
            continue
        ds_ = newb * _TRI_BLOCK
        tblT[:12, ds_:ds_ + (e - s)] = tbl[s:e].T
        tblT[12, ds_:ds_ + (e - s)] = order[s:e].astype(np.float32)
    return tblT, aabbs, aabbs_m


def _segment_pregate_table(aabbs, n_blocks, n_seg):
    """Host build of the SEGMENT PRE-GATE box table (_segment_pregate):
    per segment the union box of its live blocks' AABBs, in the
    lane-major interval layout (segment s = group s//_IGRP, sublane
    s%_IGRP; NaN boxes past n_seg fail every sign-constrained half -
    their bits are never read anyway, the walks stop at n_seg)."""
    segb = np.full((n_seg, 6), np.nan, np.float32)
    for s in range(n_seg):
        blk = aabbs[s * _SEG:min((s + 1) * _SEG, n_blocks)]
        live = blk[:, 0] <= blk[:, 3]
        if live.any():
            segb[s, :3] = blk[live, :3].min(axis=0)
            segb[s, 3:] = blk[live, 3:].max(axis=0)
    segiv_t = _aabb_interval_rows(segb)
    ng_s = -(-n_seg // _IGRP)
    segiv_t[:, ng_s:] = np.nan
    for s in range(n_seg, ng_s * _IGRP):
        g, u = divmod(s, _IGRP)
        for c in range(6):
            segiv_t[c * _IGRP + u, g] = np.nan
    return segiv_t


def _aabb_interval_rows(aabbs):
    """Lane-major block-AABB table for the vector interval gate:
    component c (0-2 lo.xyz, 3-5 hi.xyz) of block g*_IGRP+u lands at
    [c*_IGRP + u, g], so one (_IGRP, ng) vector op tests _IGRP*128
    blocks at once.  Lanes past the last group carry empty boxes (never
    read: the scalar walks bound their group chunks by n_blocks)."""
    nb = aabbs.shape[0]
    ng = -(-nb // _IGRP)
    ng_pad = -(-ng // 128) * 128
    out = np.empty((6 * _IGRP, ng_pad), np.float32)
    big = np.float32(3e38)
    for c in range(6):
        fill = big if c < 3 else -big
        comp = np.full(ng * _IGRP, fill, np.float32)
        comp[:nb] = aabbs[:, c]
        rows = np.full((_IGRP, ng_pad), fill, np.float32)
        rows[:, :ng] = comp.reshape(ng, _IGRP).T
        out[c * _IGRP:(c + 1) * _IGRP] = rows
    return out


def _stream_gate_table(aabb_iv, n_blocks, n_seg, cols, cpad):
    """Segment-sliced HBM gate table (n_seg, 6*_IGRP, cpad) for the
    stream tier.  Group columns past the real mesh - the lane padding to
    cpad and the final segment's tail when n_blocks % _SEG != 0 - carry
    NaN sentinel boxes: NaN propagates through the interval slab's
    min/max chains and fails ``exi >= ent`` on every sign-constrained
    bundle half, so phantom groups produce zero gate bits (the
    refinement's chunk skips and the take-list's group skips stay
    effective on the padded tail).  An inverted (+big, -big) fill would
    do the opposite - the slab takes [min, max] over the two plane
    candidates, making an inverted box ALWAYS-HIT (see _tri_blocks) -
    and with the gate-only path that flagged phantom blocks past
    tblT's extent into the scan's take-list."""
    ng_real = -(-n_blocks // _IGRP)
    aiv3 = np.full((n_seg, 6 * _IGRP, cpad), np.nan, np.float32)
    for s in range(n_seg):
        gl0, gl1 = s * cols, min((s + 1) * cols, ng_real)
        if gl1 > gl0:
            aiv3[s, :, :gl1 - gl0] = aabb_iv[:, gl0:gl1]
    return aiv3


def _scene_const(scn):
    return {
        "square_k": tuple(float(v) for v in scn.square_k),
        "square_z": tuple(float(v) for v in scn.square_z),
        "spheres": tuple(tuple(float(v) for v in c)
                         for c in scn.sphere_centers),
        "lights": tuple(tuple(float(v) for v in l) for l in scn.lights),
    }


# SMEM is ~32KB total (measured; see ops/pallas_bpt.py): up to 512
# triangle rows live directly in SMEM; larger meshes switch to the
# Morton-blocked DMA-streamed scan (block AABBs in SMEM: 24 B/block), up
# to the reference's own MAX_TRIANGLES (trianglegrid .c:15).  Past THAT
# (the exact-flag tables - AABBs + flag columns - would blow the SMEM
# budget) the STREAM tier takes over: take-lists come straight from the
# segment-sliced interval gate, so SMEM use is constant in mesh size and
# the cap is set by the HBM triangle table instead (64 B/triangle).
_MAX_SMEM_TRIANGLES = 512
_MAX_BLOCKED_TRIANGLES = 1 << 16
_MAX_STREAM_TRIANGLES = 1 << 20


def supported(scn, quirks: Quirks, illum_fn, tri_override,
              max_bounces: int) -> bool:
    """The megakernel covers the mirror-free super family: all estimator
    quirk modes (the _lmem carry-t aliasing runs as sequential seeded
    traces), standard direct lighting, brute-force primitives, sphere
    material 3 (no reachable mirror branch - models/super.py:159), and
    meshes to 16x the reference's MAX_TRIANGLES (65536, trianglegrid
    .c:15; SMEM-resident <= 512, Morton-blocked above, interval-stream
    past 65536)."""
    return (illum_fn is None and tri_override is None
            and scn.lights.shape[0] <= 8
            and scn.tri_v0.shape[0] <= _MAX_STREAM_TRIANGLES)


def film_super_mega(key, scn, width: int, height: int, spp: int,
                    spp_offset=0, spp_total: int | None = None,
                    quirks: Quirks = None, row_offset=0,
                    rows: int | None = None, interpret: bool = False,
                    force_blocked: bool | None = None,
                    force_stream: bool | None = None):
    """Drop-in for models/super.py::film_super on the supported family:
    returns the pre-ambient (rows, W, 3) float32 film.  Meshes beyond 512
    triangles use the Morton-blocked DMA-streamed scan; beyond 65536 the
    take-lists come straight from the interval gate with segment-local
    SMEM (``force_blocked`` / ``force_stream`` override the size
    switches for tests)."""
    if spp_total is None:
        spp_total = spp
    if rows is None:
        rows = height
    neg_t = bool(quirks.accept_negative_t) if quirks is not None else False
    carry_t = bool(quirks.shadow_carry_t) if quirks is not None else False
    nt = int(scn.tri_v0.shape[0])
    blocked = nt > _MAX_SMEM_TRIANGLES
    stream = nt > _MAX_BLOCKED_TRIANGLES
    if force_blocked is not None:
        blocked = force_blocked and nt > 0
    if force_stream is not None:
        stream = force_stream and nt > 0
    if stream:
        blocked = True

    R = width * rows
    if blocked:
        tiles_x = -(-width // _TW)
        tiles_y = -(-rows // _TH)
        n_tiles = tiles_x * tiles_y
    else:
        n_tiles = -(-R // _TILE)
    scalars = jnp.asarray([[
        jnp.asarray(key[0], _U32), jnp.asarray(key[1], _U32),
        jnp.asarray(spp_offset, _U32), jnp.asarray(spp_total, _U32),
        jnp.asarray(row_offset, _U32), 0, 0, 0]], dtype=_U32)

    if blocked:
        tblT, aabbs, aabbs_m = _tri_blocks(scn)
        n_blocks = aabbs.shape[0]
        aabb_iv = _aabb_interval_rows(aabbs)
        # global triangle-geometry box (compile-time literal): every block
        # AABB lies inside it.  Shadow bundles ANCHOR their interval-gate
        # origins to its entry point (far floor-hit origins otherwise blow
        # the origin hull to ~1e6 and degenerate the gate - see
        # _anchor_bundles).  Generous padding keeps the slab conservative
        # under f32 rounding.
        live_b = aabbs[:, 0] <= aabbs[:, 3]
        glo = aabbs[live_b, :3].min(axis=0)
        ghi = aabbs[live_b, 3:].max(axis=0)
        gpad = 0.01 * float((ghi - glo).max()) + 0.01
        gbox = tuple(float(v) for v in np.concatenate(
            [glo - gpad, ghi + gpad]))
        if stream:
            # stream tier: segment-local interval bit buffers + a
            # DMA-chunked exact refinement (SMEM constant in mesh
            # size).  Segment boundaries must respect group and
            # lane-tile alignment.
            assert _SEG % _IGRP == 0 and _MACRO % _IGRP == 0, \
                (_SEG, _MACRO, _IGRP)
            cols = _SEG // _IGRP
            # the gate table lives in HBM as (n_seg, 6*_IGRP, cpad) and
            # each segment's slice is DMA'd into the aiv_v scratch by a
            # dynamic LEADING-dim index (possibly a TRACED segment base
            # - _seg_loop runs multi-segment scans as ONE fori body,
            # program size O(1) in mesh size).  The lane dim pads to
            # >= 128 (Mosaic DMA extents must respect the 128-lane
            # tiling; default geometry has cols == 128 already) with
            # NaN sentinel boxes (NaN fails the interval slab on any
            # sign-constrained bundle half, so phantom groups past
            # n_blocks keep zero gate bits - an INVERTED (+big, -big)
            # fill would pass as always-hit, see _tri_blocks; the
            # take-list count additionally guards ids < n_blocks).
            segf = min(_SEG, n_blocks)
            n_seg = -(-n_blocks // _SEG)
            cpad = max(cols, 128)
            aiv3 = _stream_gate_table(aabb_iv, n_blocks, n_seg, cols, cpad)
            if n_seg == 1:
                # single-segment stream meshes keep the gate table
                # VMEM-resident (BlockSpec) - no per-call DMA + wait in
                # the prepass; only multi-segment scans stream it from
                # HBM by the traced segment index
                tri_inputs = [jnp.asarray(aiv3[0]), jnp.asarray(tblT)]
                tri_specs = [
                    pl.BlockSpec((6 * _IGRP, cpad), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ]
            else:
                tri_inputs = [jnp.asarray(aiv3), jnp.asarray(tblT)]
                tri_specs = [
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ]
            scratch_shapes = [pltpu.SMEM((16, _TRI_BLOCK), jnp.float32),
                              pltpu.SemaphoreType.DMA,
                              pltpu.VMEM((_IGRP, cpad), jnp.int32),
                              pltpu.SMEM((_IGRP, cpad), jnp.int32),
                              pltpu.SemaphoreType.DMA,
                              pltpu.SMEM((1, segf + 1), jnp.int32),
                              pltpu.SMEM((1, 1), jnp.int32)]
            if n_seg > 1:
                scratch_shapes += [
                    pltpu.VMEM((6 * _IGRP, cpad), jnp.float32),
                    pltpu.SemaphoreType.DMA]
            if _STREAM_REFINE:
                # (n_chunks, 8, rch) HBM block-AABB table for the exact
                # refinement (rows 0-5 = box components; NaN padding
                # columns fail every test) + segment-local flag
                # buffers, sized to the largest segment.  Chunk DMAs
                # are always full-width (rch lanes, picked by a dynamic
                # leading-dim chunk index), so the padding must cover
                # whole segments when the scan is multi-segment; rch
                # divides _SEG so chunk indices are exact.
                rch = min(_RCHUNK, _SEG)
                assert _SEG % rch == 0, (_SEG, rch)
                cover = n_seg * _SEG if n_seg > 1 else n_blocks
                wpad = -(-cover // rch) * rch
                aabbT_r = np.full((8, wpad), np.nan, np.float32)
                aabbT_r[:6, :n_blocks] = aabbs.T
                aabbT_r = np.ascontiguousarray(
                    aabbT_r.reshape(8, wpad // rch, rch).swapaxes(0, 1))
                tri_inputs.append(jnp.asarray(aabbT_r))
                tri_specs.append(pl.BlockSpec(memory_space=pl.ANY))
                scratch_shapes += [
                    pltpu.SMEM((8, rch), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.VMEM((128, 128), jnp.int32),
                    pltpu.VMEM((segf, 1), jnp.int32),
                    pltpu.SMEM((segf, 1), jnp.int32),
                    pltpu.SemaphoreType.DMA]
            if n_seg > 1:
                # SEGMENT PRE-GATE (round 5, _segment_pregate): one
                # interval test per trace skips missed segments' whole
                # prepass
                segiv_t = _segment_pregate_table(aabbs, n_blocks, n_seg)
                tri_inputs.append(jnp.asarray(segiv_t))
                tri_specs.append(
                    pl.BlockSpec(segiv_t.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
                scratch_shapes += [
                    pltpu.VMEM((1, segiv_t.shape[1]), jnp.int32),
                    pltpu.SMEM((1, segiv_t.shape[1]), jnp.int32),
                    pltpu.SemaphoreType.DMA]
        else:
            tri_inputs = [jnp.asarray(aabbs), jnp.asarray(aabb_iv),
                          jnp.asarray(tblT)]
            tri_specs = [
                pl.BlockSpec((n_blocks, 6), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(aabb_iv.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            if n_blocks > _SEG:
                # segmented blocked scans (experimental _SEG below the
                # production 1024) carry the segment pre-gate too
                n_seg_b = -(-n_blocks // _SEG)
                segiv_t = _segment_pregate_table(aabbs, n_blocks, n_seg_b)
                tri_inputs.append(jnp.asarray(segiv_t))
                tri_specs.append(
                    pl.BlockSpec(segiv_t.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
            nb_pad = -(-n_blocks // 128) * 128
            ng_pad = aabb_iv.shape[1]
            scratch_shapes = [pltpu.SMEM((16, _TRI_BLOCK), jnp.float32),
                              pltpu.SemaphoreType.DMA,
                              pltpu.VMEM((128, 128), jnp.int32),
                              pltpu.VMEM((nb_pad, 1), jnp.int32),
                              pltpu.SMEM((nb_pad, 1), jnp.int32),
                              pltpu.SMEM((1, n_blocks + 1), jnp.int32),
                              pltpu.SemaphoreType.DMA,
                              pltpu.VMEM((_IGRP, ng_pad), jnp.int32),
                              pltpu.SMEM((_IGRP, ng_pad), jnp.int32),
                              pltpu.SMEM((1, 1), jnp.int32)]
            if n_blocks > _SEG:
                scratch_shapes += [
                    pltpu.VMEM((1, segiv_t.shape[1]), jnp.int32),
                    pltpu.SMEM((1, segiv_t.shape[1]), jnp.int32),
                    pltpu.SemaphoreType.DMA]
        ntp = tblT.shape[1]
    else:
        n_blocks = 0
        ntp = max(_TRI_UNROLL, -(-nt // _TRI_UNROLL) * _TRI_UNROLL)
        tbl = np.zeros((ntp, 12), np.float32)  # padded rows: det==0 never hit
        if nt:
            from .intersect import _tri_table
            tbl[:nt] = _tri_table(scn)
        tri_inputs = [jnp.asarray(tbl)]
        tri_specs = [pl.BlockSpec((ntp, 12), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)]
        scratch_shapes = []

    kernel = functools.partial(
        _mega_kernel, width=width, spp=spp, scn_const=_scene_const(scn),
        neg_t=neg_t, nt=nt, n_blocks=n_blocks, carry_t=carry_t,
        stream=stream and blocked,
        stream_refine=bool(stream and blocked and _STREAM_REFINE),
        gbox=gbox if blocked else None)
    global _UNROLL
    prev_unroll = _UNROLL
    _UNROLL = not interpret
    try:
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ] + tri_specs,
            out_specs=pl.BlockSpec((3 * _SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * 3 * _SUB, 128),
                                           jnp.float32),
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=R * spp * (150 * max(1, nt) + 500),
                bytes_accessed=R * 12 + ntp * 48,
                transcendentals=R * spp * 8,
            ),
            interpret=interpret,
        )(scalars, *tri_inputs)
    finally:
        _UNROLL = prev_unroll

    if blocked:
        # (ty, tx, 3, TH, TW) -> (ty*TH, tx*TW, 3), ghost pixels dropped
        film = (out.reshape(tiles_y, tiles_x, 3, _TH, _TW)
                .transpose(0, 3, 1, 4, 2)
                .reshape(tiles_y * _TH, tiles_x * _TW, 3))
        return film[:rows, :width]
    film = (out.reshape(n_tiles, 3, _SUB, 128)
            .transpose(0, 2, 3, 1)
            .reshape(n_tiles * _TILE, 3)[:R])
    return film.reshape(rows, width, 3)
