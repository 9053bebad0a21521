"""Pallas TPU megakernel for CLSimplePathTracer - the multi-bounce mirrors.

The simple tracer is the one shipped variant whose bounce loop actually
recurses: the bitmap spheres are mirrors (material 2, spt.ocl:68), so a
sample is up to 5 chained (trace -> shadow -> shade -> reflect) rounds
with the colorFact/divFact unrolled-recursion accumulators
(spt.ocl:77-127).  The XLA wavefront (models/simple.py) runs this at
~76 Mpaths/s; this kernel applies the super megakernel's recipe
(ops/pallas_super.py) to the full 5-bounce loop: lane-major (16, 128)
vregs end to end, the 49-sphere bitmap streamed from SMEM, the film tile
resident in VMEM across the spp loop.

Semantics match models/simple.py::_sample to float rounding for both the
default and reference estimator quirks (specular divFact multiply);
equality is pinned by tests/test_megakernel.py::test_simple_megakernel_*.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quirks import Quirks
from ..models import common as C
from .pallas_super import (_EPS, _BIG, _SUB, _TILE, _U32, _threefry, _unit,
                           _normalize3, _primary_rays_k)

_SPH_UNROLL = 7   # 49 spheres = 7 x 7 rows per fori step
_SPP_GROUP = 2    # spp samples sharing each sphere-table pass (the
                  # pallas_super._SPP_GROUP recipe: rows read once per
                  # group).  Interleaved on-chip A/B at 1024^2x256
                  # post-stacking (tools/diag_sppgroup_other.py):
                  # G=1 186.1, G=2 194.2, G=4 184.7 Mpaths/s.
                  # (Original round-2 note: rows read once per
                  # group; bounce loops run in lockstep, masked per sample)


def _pow99(x):
    """x**99 by binary exponentiation (models/common.py::pow99 - sign
    preserving, unlike exp/log pow)."""
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    x32 = x16 * x16
    x64 = x32 * x32
    return x64 * x32 * x2 * x


def _trace_floor_spheres_multi(sph_ref, n_sph: int, rays):
    """Closest hit against floor (m=1) + mirror spheres (m=2) for SEVERAL
    ray bundles sharing one pass over the sphere table - each row's 3
    scalars are read once per group (the simple tracer's TraceRay,
    spt.ocl:42-75); sphere normals come back normalised."""
    one = np.float32(1.0)
    B = len(rays)
    sub = rays[0][0][0].shape[0]
    # stacked bundles (pallas_super.py::_closest_blocked_multi): every
    # sphere test runs as ONE tall (B*sub, 128) op instead of one per
    # ray - identical per-lane math, B x fewer traced eqns (JAX tracing
    # costs ~0.3-0.9 ms per eqn; docs/PERF.md "Tracing cost")
    sox, soy, soz = (jnp.concatenate([o3[c] for o3, _ in rays], axis=0)
                     for c in range(3))
    sdx, sdy, sdz = (jnp.concatenate([d3[c] for _, d3 in rays], axis=0)
                     for c in range(3))
    t = jnp.full(sox.shape, _BIG, jnp.float32)
    m = jnp.zeros(sox.shape, jnp.int32)
    nx = jnp.zeros(sox.shape, jnp.float32)
    ny = jnp.zeros(sox.shape, jnp.float32)
    nz = jnp.zeros(sox.shape, jnp.float32)
    p = -soz * (one / sdz)
    hit = (p > _EPS) & (p < t)
    t = jnp.where(hit, p, t)
    m = jnp.where(hit, 1, m)
    nz = jnp.where(hit, one, nz)

    def step(i, carry):
        t, m, nx, ny, nz = carry
        for u in range(_SPH_UNROLL):
            row = i * _SPH_UNROLL + u
            cx = sph_ref[row, 0]
            cy = sph_ref[row, 1]
            cz = sph_ref[row, 2]
            px, py, pz = sox - cx, soy - cy, soz - cz
            b = px * sdx + py * sdy + pz * sdz
            cc = px * px + py * py + pz * pz - one
            q = b * b - cc
            s = -b - jnp.sqrt(jnp.maximum(q, np.float32(0.0)))
            ok = (q > np.float32(0.0)) & (s < t) & (s > _EPS)
            t = jnp.where(ok, s, t)
            m = jnp.where(ok, 2, m)
            nx = jnp.where(ok, px + sdx * s, nx)
            ny = jnp.where(ok, py + sdy * s, ny)
            nz = jnp.where(ok, pz + sdz * s, nz)
        return t, m, nx, ny, nz

    nr = -(-n_sph // _SPH_UNROLL)
    t, m, nx, ny, nz = jax.lax.fori_loop(0, nr, step, (t, m, nx, ny, nz))
    inv_len = jnp.where(
        m == 2,
        jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                  np.float32(1e-30))),
        one)
    nx, ny, nz = nx * inv_len, ny * inv_len, nz * inv_len
    return [tuple(v[k * sub:(k + 1) * sub] for v in (t, m, nx, ny, nz))
            for k in range(B)]


def _occluded_floor_spheres_multi(sph_ref, n_sph: int, rays):
    """Uncapped any-hit against floor + spheres for several rays sharing
    one table pass (the shadow test's full TraceRay, spt.ocl:106)."""
    one = np.float32(1.0)
    B = len(rays)
    sub = rays[0][0][0].shape[0]
    # stacked bundles (see _trace_floor_spheres_multi)
    sox, soy, soz = (jnp.concatenate([o3[c] for o3, _ in rays], axis=0)
                     for c in range(3))
    sdx, sdy, sdz = (jnp.concatenate([d3[c] for _, d3 in rays], axis=0)
                     for c in range(3))
    p = -soz * (one / sdz)
    occ = ((p > _EPS) & (p < _BIG)).astype(jnp.int32)

    def step(i, occ):
        for u in range(_SPH_UNROLL):
            row = i * _SPH_UNROLL + u
            cx = sph_ref[row, 0]
            cy = sph_ref[row, 1]
            cz = sph_ref[row, 2]
            px, py, pz = sox - cx, soy - cy, soz - cz
            b = px * sdx + py * sdy + pz * sdz
            cc = px * px + py * py + pz * pz - one
            q = b * b - cc
            s = -b - jnp.sqrt(jnp.maximum(q, np.float32(0.0)))
            occ = jnp.where(
                (q > np.float32(0.0)) & (s < _BIG) & (s > _EPS),
                1, occ)
        return occ

    nr = -(-n_sph // _SPH_UNROLL)
    occ = jax.lax.fori_loop(0, nr, step, occ)
    return [occ[k * sub:(k + 1) * sub] for k in range(B)]


def _simple_mega_kernel(scalars_ref, sph_ref, out_ref, *, width: int,
                        spp: int, n_sph: int, max_bounces: int,
                        spec_mul: bool):
    k0 = scalars_ref[0, 0]
    k1 = scalars_ref[0, 1]
    spp_offset = scalars_ref[0, 2]
    spp_total = scalars_ref[0, 3]
    row_offset = scalars_ref[0, 4]

    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 0)
    p_local = tile * _TILE + sub * 128 + lane
    w = np.int32(width)
    ii_i = p_local % w
    jj_row = p_local // w
    row_off_i = row_offset.astype(jnp.int32)
    ii = ii_i.astype(jnp.float32)
    jj = (jj_row + row_off_i).astype(jnp.float32)
    pixel_index = ((jj_row + row_off_i) * w + ii_i).astype(_U32)
    one = np.float32(1.0)
    zero = np.float32(0.0)

    def sample_group_body(g, acc, G):
        """G spp samples per iteration, their bounce loops in lockstep:
        every trace and shadow pass over the 49-sphere table is shared
        (rows read once per group).  Accumulation order matches the
        single-sample loop, so the film is bit-identical."""
        fr, fg, fb = acc
        ray_ids = []
        states = []
        for j in range(G):
            s32 = (g * G + j).astype(_U32) + spp_offset
            ray_id = pixel_index * spp_total + s32
            b0, b1 = _threefry(k0, k1, ray_id, jnp.zeros_like(ray_id))
            b2, b3 = _threefry(k0, k1, ray_id, jnp.ones_like(ray_id))
            r1, r2, r3, r4 = _unit(b0), _unit(b1), _unit(b2), _unit(b3)
            ox, oy, oz, dx, dy, dz = _primary_rays_k(ii, jj, r1, r2,
                                                     r3, r4)
            ray_ids.append(ray_id)
            zl = jnp.zeros(ox.shape, jnp.float32)
            states.append((jnp.ones(ox.shape, jnp.int32), ox, oy, oz,
                           dx, dy, dz, zl, zl, zl, jnp.ones_like(zl),
                           zl, zl, zl))

        def bounce(b, carry):
            carry = list(carry)
            prim = [((st[1], st[2], st[3]), (st[4], st[5], st[6]))
                    for st in carry]
            traces = _trace_floor_spheres_multi(sph_ref, n_sph, prim)

            shadow = []
            mids = []
            for j in range(G):
                (alive, ox, oy, oz, dx, dy, dz,
                 cfr, cfg, cfb, div, rr, rg, rb) = carry[j]
                t, m, nx, ny, nz = traces[j]
                m = jnp.where(alive != 0, m, -1)
                x = ox + dx * t
                y = oy + dy * t
                z = oz + dz * t
                # jittered implicit light (9 + r1, 9 + r2, 16)
                # (spt.ocl:99); site = SITE_LIGHT0 + bounce * stride
                site = (np.uint32(C.SITE_LIGHT0)
                        + b.astype(_U32) * np.uint32(C.SITE_STRIDE_BOUNCE)
                        ) * np.uint32(8)
                u0, u1 = _threefry(k0, k1, ray_ids[j],
                                   jnp.zeros_like(ray_ids[j]) + site)
                u1f, u2f = _unit(u0), _unit(u1)
                ldx = np.float32(9.0) + u1f - x
                ldy = np.float32(9.0) + u2f - y
                ldz = np.float32(16.0) - z
                ldir = _normalize3(ldx, ldy, ldz)
                shadow.append(((x, y, z), ldir))
                mids.append((m, x, y, z, ldir))
            occs = _occluded_floor_spheres_multi(sph_ref, n_sph, shadow)

            for j in range(G):
                (alive, ox, oy, oz, dx, dy, dz,
                 cfr, cfg, cfb, div, rr, rg, rb) = carry[j]
                t, m_raw, nx, ny, nz = traces[j]
                m, x, y, z, (ldx, ldy, ldz) = mids[j]
                inv_div = one / div

                # miss -> sky (spt.ocl:92-95)
                skyf = one - dz
                sky2 = skyf * skyf
                sky4 = sky2 * sky2
                is_sky = m == 0
                rr = jnp.where(is_sky,
                               cfr + np.float32(C.SKY[0]) * sky4 * inv_div,
                               rr)
                rg = jnp.where(is_sky,
                               cfg + np.float32(C.SKY[1]) * sky4 * inv_div,
                               rg)
                rb = jnp.where(is_sky,
                               cfb + np.float32(C.SKY[2]) * sky4 * inv_div,
                               rb)

                # half = reflect(d, n) (spt.ocl:100)
                ndd = nx * dx + ny * dy + nz * dz
                hx = dx - np.float32(2.0) * ndd * nx
                hy = dy - np.float32(2.0) * ndd * ny
                hz = dz - np.float32(2.0) * ndd * nz

                lamb = ldx * nx + ldy * ny + ldz * nz
                lamb = jnp.where((lamb < 0) | (occs[j] != 0), zero, lamb)
                spec = _pow99((ldx * hx + ldy * hy + ldz * hz)
                              * jnp.where(lamb > 0, one, zero))

                # floor -> checker * (lamb*0.2 + 0.1) (spt.ocl:112-115)
                ipx = x * np.float32(0.2)
                ipy = y * np.float32(0.2)
                sel = (jnp.ceil(ipx) + jnp.ceil(ipy)).astype(jnp.int32) & 1
                red = sel == 1
                fmag = (lamb * np.float32(0.2) + np.float32(0.1)) * inv_div
                is_fl = m == 1

                def fl_ch(cf, res, cr, cw):
                    col = jnp.where(red, np.float32(cr), np.float32(cw))
                    return jnp.where(is_fl, cf + col * fmag, res)

                rr = fl_ch(cfr, rr, C.FLOOR_RED[0], C.FLOOR_WHITE[0])
                rg = fl_ch(cfg, rg, C.FLOOR_RED[1], C.FLOOR_WHITE[1])
                rb = fl_ch(cfb, rb, C.FLOOR_RED[2], C.FLOOR_WHITE[2])

                # mirror -> add highlight, bounce (spt.ocl:120-125); the
                # reference multiplies the highlight by divFact
                # (spt.ocl:121 - quirks.specular_divfact_multiply);
                # intended math divides
                bounce_m = m == 2
                hl = spec * (div if spec_mul else inv_div)
                cfr = jnp.where(bounce_m, cfr + hl, cfr)
                cfg = jnp.where(bounce_m, cfg + hl, cfg)
                cfb = jnp.where(bounce_m, cfb + hl, cfb)
                ox = jnp.where(bounce_m, x, ox)
                oy = jnp.where(bounce_m, y, oy)
                oz = jnp.where(bounce_m, z, oz)
                dx = jnp.where(bounce_m, hx, dx)
                dy = jnp.where(bounce_m, hy, dy)
                dz = jnp.where(bounce_m, hz, dz)
                div = jnp.where(bounce_m, div * np.float32(2.0), div)
                alive = jnp.where(bounce_m, alive, 0)
                carry[j] = (alive, ox, oy, oz, dx, dy, dz,
                            cfr, cfg, cfb, div, rr, rg, rb)
            return tuple(carry)

        states = jax.lax.fori_loop(0, max_bounces, bounce, tuple(states))
        for j in range(G):
            alive, cfr, cfg, cfb = (states[j][0], states[j][7],
                                    states[j][8], states[j][9])
            rr, rg, rb = states[j][11], states[j][12], states[j][13]
            # recursion-cap exhaustion -> accumulated highlights
            # (models/simple.py:83-85)
            live = alive != 0
            fr = fr + jnp.where(live, cfr, rr)
            fg = fg + jnp.where(live, cfg, rg)
            fb = fb + jnp.where(live, cfb, rb)
        return fr, fg, fb

    zero2 = jnp.zeros((_SUB, 128), jnp.float32)
    acc = (zero2, zero2, zero2)
    G = _SPP_GROUP
    if spp >= G:
        acc = jax.lax.fori_loop(
            0, spp // G, functools.partial(sample_group_body, G=G), acc)
    for tail_s in range((spp // G) * G, spp):
        acc = sample_group_body(jnp.int32(tail_s), acc, G=1)
    fr, fg, fb = acc
    out_ref[pl.ds(0, _SUB), :] = fr * C.EXPOSURE
    out_ref[pl.ds(_SUB, _SUB), :] = fg * C.EXPOSURE
    out_ref[pl.ds(2 * _SUB, _SUB), :] = fb * C.EXPOSURE


def film_simple_mega(key, scn, width: int, height: int, spp: int,
                     spp_offset=0, spp_total: int | None = None,
                     quirks: Quirks = None, row_offset=0,
                     rows: int | None = None,
                     max_bounces: int = C.MAX_BOUNCES,
                     interpret: bool = False):
    """Drop-in for models/simple.py's film body: returns the pre-ambient
    (rows, W, 3) float32 film for the floor + mirror-sphere scene."""
    if spp_total is None:
        spp_total = spp
    if rows is None:
        rows = height
    n_sph = int(scn.sphere_centers.shape[0])
    nrp = max(_SPH_UNROLL, -(-n_sph // _SPH_UNROLL) * _SPH_UNROLL)
    # padded rows sit far outside the scene: never hit
    sph = np.full((nrp, 3), 1e9, np.float32)
    sph[:n_sph] = np.asarray(scn.sphere_centers, np.float32)

    spec_mul = bool(quirks.specular_divfact_multiply) if quirks else False
    R = width * rows
    n_tiles = -(-R // _TILE)
    scalars = jnp.asarray([[
        jnp.asarray(key[0], _U32), jnp.asarray(key[1], _U32),
        jnp.asarray(spp_offset, _U32), jnp.asarray(spp_total, _U32),
        jnp.asarray(row_offset, _U32), 0, 0, 0]], dtype=_U32)

    kernel = functools.partial(
        _simple_mega_kernel, width=width, spp=spp, n_sph=n_sph,
        max_bounces=max_bounces, spec_mul=spec_mul)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nrp, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3 * _SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 3 * _SUB, 128),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=R * spp * max_bounces * (30 * max(1, n_sph) + 300),
            bytes_accessed=R * 12 + nrp * 12,
            transcendentals=R * spp * max_bounces * 4,
        ),
        interpret=interpret,
    )(scalars, jnp.asarray(sph))

    film = (out.reshape(n_tiles, 3, _SUB, 128)
            .transpose(0, 2, 3, 1)
            .reshape(n_tiles * _TILE, 3)[:R])
    return film.reshape(rows, width, 3)
