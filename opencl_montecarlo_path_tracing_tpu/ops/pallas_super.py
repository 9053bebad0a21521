"""Pallas TPU megakernel: the COMPLETE super sample step in one kernel.

One program renders a 2048-pixel tile for all spp: counter-based threefry
draws, thin-lens camera rays, the full primitive scan (floor / squares /
spheres / division-free Moller-Trumbore triangles), one uncapped shadow
trace per light, 4-material shading and film accumulation - the film tile
lives in VMEM registers across the whole spp loop and is written to HBM
once.  Reference hot loop: CLSuperPathTracer/pathtracer.ocl:220-241 (the
per-pixel megakernel this mirrors, wavefront-style).

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

_U32 = jnp.uint32
_ROTS = ((13, 15, 26, 6), (17, 29, 16, 24))
_PARITY = np.uint32(0x1BD11BDA)


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


def _unit(bits):
    # Mosaic has no uint32->f32 cast; bits>>8 < 2^24 so the int32 view is
    # value-identical
    i = (bits >> np.uint32(8)).astype(jnp.int32)
    return i.astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _normalize3(x, y, z):
    inv = np.float32(1.0) / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _trace_kernel(tbl_ref, ox, oy, oz, dx, dy, dz, scn_const, neg_t: bool,
                  nt: int):
    """Closest-hit scan, semantics of ops/intersect.py::trace_ray with
    sphere_material=3.  Returns (t, m, nx, ny, nz) with sphere normals
    already normalised."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    t = jnp.full(ox.shape, _BIG, jnp.float32)
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

    # triangles: division-free scan, _TRI_UNROLL SMEM rows per step
    if nt:
        bn, bd = t, jnp.ones_like(t)

        def tri_step(i, carry):
            bn, bd, m, nx, ny, nz, needs = carry
            for u in range(_TRI_UNROLL):
                row = i * _TRI_UNROLL + u
                r = [tbl_ref[row, j] for j in range(12)]
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

        ntp = -(-nt // _TRI_UNROLL)
        bn, bd, m, nx, ny, nz, needs = jax.lax.fori_loop(
            0, ntp, tri_step, (bn, bd, m, nx, ny, nz, needs))
        t = bn / bd

    inv_len = jnp.where(
        needs != 0,
        jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                  np.float32(1e-30))),
        one)
    return t, m, nx * inv_len, ny * inv_len, nz * inv_len


def _occluded_kernel(tbl_ref, ox, oy, oz, dx, dy, dz, scn_const,
                     neg_t: bool, nt: int):
    """Uncapped occlusion scan (ops/intersect.py::any_hit, t_limit=1e9)."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    tl = _BIG
    inv_dz = one / dz
    p = -oz * inv_dz
    occ = ((p > _EPS) & (p < tl)).astype(jnp.int32)
    for k, z in zip(scn_const["square_k"], scn_const["square_z"]):
        rd = (np.float32(z) - oz) * inv_dz
        ix = ox + dx * rd
        iy = oy + dy * rd
        ok = (rd < tl) & (jnp.abs(np.float32(k) - ix) < 1.0) & (jnp.abs(iy) < 1.0)
        if not neg_t:
            ok = ok & (rd > _EPS)
        occ = jnp.where(ok, 1, occ)
    for cx, cy, cz in scn_const["spheres"]:
        px, py, pz = ox - np.float32(cx), oy - np.float32(cy), oz - np.float32(cz)
        b = px * dx + py * dy + pz * dz
        cc = px * px + py * py + pz * pz - one
        q = b * b - cc
        s = -b - jnp.sqrt(jnp.maximum(q, zero))
        occ = jnp.where((q > zero) & (s < tl) & (s > _EPS), 1, occ)
    if nt:
        def tri_step(i, occ):
            for u in range(_TRI_UNROLL):
                row = i * _TRI_UNROLL + u
                r = [tbl_ref[row, j] for j in range(9)]
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
                occ = jnp.where(ok, 1, occ)
            return occ

        ntp = -(-nt // _TRI_UNROLL)
        occ = jax.lax.fori_loop(0, ntp, tri_step, occ)
    return occ


def _mega_kernel(scalars_ref, tbl_ref, out_ref, *, width: int, spp: int,
                 scn_const, neg_t: bool, nt: int):
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
    p_local = tile * _TILE + sub * 128 + lane
    w = np.int32(width)
    ii_i = p_local % w
    jj_row = p_local // w
    row_off_i = row_offset.astype(jnp.int32)
    ii = ii_i.astype(jnp.float32)
    jj = (jj_row + row_off_i).astype(jnp.float32)
    pixel_index = ((jj_row + row_off_i) * w + ii_i).astype(_U32)
    one = np.float32(1.0)

    cam = make_camera(z_sign=-1.0)
    upx, upy, upz = (np.float32(v) for v in cam.up)
    rix, riy, riz = (np.float32(v) for v in cam.right)
    eyx, eyy, eyz = (np.float32(v) for v in cam.eye_offset)
    psx, psy, psz = (np.float32(v) for v in cam.pos)
    lights = scn_const["lights"]

    def sample_body(s, acc):
        fr, fg, fb = acc
        s32 = s.astype(_U32) + spp_offset
        ray_id = pixel_index * spp_total + s32

        # camera draws: site 0, counters 0 and 1 (core/rng.py randn_draws)
        b0, b1 = _threefry(k0, k1, ray_id, jnp.zeros_like(ray_id))
        b2, b3 = _threefry(k0, k1, ray_id, jnp.ones_like(ray_id))
        r1, r2, r3, r4 = _unit(b0), _unit(b1), _unit(b2), _unit(b3)

        # primary rays (core/camera.py::primary_rays)
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
        inv_n = one / jnp.sqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n

        t, m, nx, ny, nz = _trace_kernel(tbl_ref, ox, oy, oz, dx, dy, dz,
                                         scn_const, neg_t, nt)
        x = ox + dx * t
        y = oy + dy * t
        z = oz + dz * t

        # direct lighting: jittered shadow ray per light (site 2 + i)
        ti = jnp.zeros_like(t)
        for i, (lx, ly, lz, li) in enumerate(lights):
            site = np.uint32((C.SITE_LIGHT0 + i) * 8)
            u0, u1 = _threefry(k0, k1, ray_id, jnp.full_like(ray_id, site))
            u1f, u2f = _unit(u0), _unit(u1)
            ldx = np.float32(lx) + u1f - x
            ldy = np.float32(ly) + u2f - y
            ldz = np.float32(lz) - z
            ldx, ldy, ldz = _normalize3(ldx, ldy, ldz)
            lamb = ldx * nx + ldy * ny + ldz * nz
            occ = _occluded_kernel(tbl_ref, x, y, z, ldx, ldy, ldz,
                                   scn_const, neg_t, nt)
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

        fr = fr + shade(C.SKY[0], C.FLOOR_RED[0], C.FLOOR_WHITE[0], C.DIFFUSE[0])
        fg = fg + shade(C.SKY[1], C.FLOOR_RED[1], C.FLOOR_WHITE[1], C.DIFFUSE[1])
        fb = fb + shade(C.SKY[2], C.FLOOR_RED[2], C.FLOOR_WHITE[2], C.DIFFUSE[2])
        return fr, fg, fb

    zero = jnp.zeros((_SUB, 128), jnp.float32)
    fr, fg, fb = jax.lax.fori_loop(0, spp, sample_body, (zero, zero, zero))
    out_ref[pl.ds(0, _SUB), :] = fr * C.EXPOSURE
    out_ref[pl.ds(_SUB, _SUB), :] = fg * C.EXPOSURE
    out_ref[pl.ds(2 * _SUB, _SUB), :] = fb * C.EXPOSURE


def _scene_const(scn):
    return {
        "square_k": tuple(float(v) for v in scn.square_k),
        "square_z": tuple(float(v) for v in scn.square_z),
        "spheres": tuple(tuple(float(v) for v in c)
                         for c in scn.sphere_centers),
        "lights": tuple(tuple(float(v) for v in l) for l in scn.lights),
    }


def supported(scn, quirks: Quirks, illum_fn, tri_override,
              max_bounces: int) -> bool:
    """The megakernel covers the mirror-free super family: default/reference
    estimator quirks (not the _lmem carry-t aliasing), standard direct
    lighting, brute-force primitives, sphere material 3 (no reachable
    mirror branch - models/super.py:159)."""
    return (illum_fn is None and tri_override is None
            and not quirks.shadow_carry_t
            and scn.lights.shape[0] <= 8)


def film_super_mega(key, scn, width: int, height: int, spp: int,
                    spp_offset=0, spp_total: int | None = None,
                    quirks: Quirks = None, row_offset=0,
                    rows: int | None = None, interpret: bool = False):
    """Drop-in for models/super.py::film_super on the supported family:
    returns the pre-ambient (rows, W, 3) float32 film."""
    if spp_total is None:
        spp_total = spp
    if rows is None:
        rows = height
    neg_t = bool(quirks.accept_negative_t) if quirks is not None else False
    nt = int(scn.tri_v0.shape[0])
    ntp = max(_TRI_UNROLL, -(-nt // _TRI_UNROLL) * _TRI_UNROLL)
    tbl = np.zeros((ntp, 12), np.float32)  # padded rows: det==0, never hit
    if nt:
        from .intersect import _tri_table
        tbl[:nt] = _tri_table(scn)

    R = width * rows
    n_tiles = -(-R // _TILE)
    scalars = jnp.asarray([[
        jnp.asarray(key[0], _U32), jnp.asarray(key[1], _U32),
        jnp.asarray(spp_offset, _U32), jnp.asarray(spp_total, _U32),
        jnp.asarray(row_offset, _U32), 0, 0, 0]], dtype=_U32)

    kernel = functools.partial(
        _mega_kernel, width=width, spp=spp, scn_const=_scene_const(scn),
        neg_t=neg_t, nt=nt)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ntp, 12), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((3 * _SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 3 * _SUB, 128),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=R * spp * (150 * max(1, nt) + 500),
            bytes_accessed=R * 12 + ntp * 48,
            transcendentals=R * spp * 8,
        ),
        interpret=interpret,
    )(scalars, jnp.asarray(tbl))

    film = (out.reshape(n_tiles, 3, _SUB, 128)
            .transpose(0, 2, 3, 1)
            .reshape(n_tiles * _TILE, 3)[:R])
    return film.reshape(rows, width, 3)
