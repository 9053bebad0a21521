"""Batched primitive intersection (floor / squares / spheres / triangles).

The reference's TraceRay is a per-ray sequential scan over primitive classes
(CLSuperPathTracer/pathtracer.ocl:48-137): floor, then the square bitmap,
then the sphere bitmap, then a Moller-Trumbore loop over triangles, each
accepting a hit only when strictly closer than the best so far.

TPU-native expression: the scene is *static per compile* (shapes and values
baked as literals), and the primitive loops are unrolled in Python over
numpy scalar constants while rays stay as flat float32 arrays on the
128-lane axis.  XLA fuses the whole scan into one register/VMEM-resident
pass over the ray batch - no (n_rays x n_prims) intermediates ever touch
HBM, which is what limits the naive broadcast formulation (measured 8
Mpaths/s broadcast vs target >= 100).  The sequential thread of the running
best-t through every primitive preserves the reference's exact ordering and
strict-< tie semantics.

Meshes with >= _MXU_MIN_TRIANGLES triangles route to the fused Pallas MXU
kernel (ops/pallas_tri.py); larger still should use the uniform grid
(ops/grid.py).

Semantics preserved exactly (with Quirks toggles, see core/quirks.py):
  floor   (ocl:65-70):   p = -oz/dz, hit if 0.01 < p < t, m=1, n=(0,0,1)
  squares (ocl:73-86):   rd = (4+j-oz)/dz, hit if rd < t and |k-ix|<1 and
                         |iy|<1 (NO positivity check in the reference), m=3
  spheres (ocl:88-108):  |o + t d - c| = 1, nearest root, hit if q > 0 and
                         0.01 < rd < t, m=3, n = normalize(p + d rd)
  triangles (ocl:111-134): Moller-Trumbore, reject |det| < 0.01, u in [0,1],
                         v >= 0, u+v <= 1; hit if rd < t (NO positivity check
                         in the reference), m=4, n = normalize(e0 x e2)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.quirks import Quirks, DEFAULT
from ..scene.scene import Scene

_EPS = np.float32(0.01)
_BIG = np.float32(1e9)
_INF = np.float32(np.inf)


class SceneArrays(NamedTuple):
    """Host-side SoA scene (numpy); values are baked into jitted renderers
    as literals, so shapes AND contents are static per compile."""
    sphere_centers: np.ndarray  # (Ns, 3)
    square_k: np.ndarray        # (Nq,)
    square_z: np.ndarray        # (Nq,)  plane height = j + 4
    tri_v0: np.ndarray          # (Nt, 3)
    tri_e0: np.ndarray          # (Nt, 3)  v1 - v0
    tri_e2: np.ndarray          # (Nt, 3)  v2 - v0
    tri_n: np.ndarray           # (Nt, 3)  normalize(e0 x e2)
    tri_w: np.ndarray           # (13, 4*Nt) MXU weights (see _triangle_weights)
    lights: np.ndarray          # (Nl, 4)

    def fingerprint(self) -> bytes:
        import hashlib
        h = hashlib.sha1()
        for a in self:
            h.update(np.ascontiguousarray(a).tobytes())
        return h.digest()


def _triangle_weights(v0, e0, e2):
    """(13, 4*Nt) weights expressing Moller-Trumbore's four per-pair scalars
    as one matmul against the ray feature vector

        f = [1, ox, oy, oz, dx, dy, dz,
             dx*oy, dx*oz, dy*ox, dy*oz, dz*ox, dz*oy]

    Derivation (scalar triple products):
        det    = e0 . (d x e2)        = d . (e2 x e0)
        u*det  = (o - v0) . (d x e2)  = d . (e2 x o) - d . (e2 x v0)
        v*det  = d . ((o - v0) x e0)  = d . (o x e0) - d . (v0 x e0)
        t*det  = e2 . ((o - v0) x e0) = o . (e0 x e2) - v0 . (e0 x e2)
    The d.(a x o) terms expand over the six off-diagonal (d_i o_j) products.
    """
    nt = v0.shape[0]
    w = np.zeros((13, 4, nt), np.float32)

    def cross(a, b):
        return np.cross(a, b).astype(np.float32)

    n1 = cross(e2, e0)                      # det = d . n1
    w[4:7, 0] = n1.T
    # u*det: bilinear coefs from e2, linear-in-d coefs -(e2 x v0)
    # d.(e2 x o) products: dx*oy: -e2z ; dx*oz: +e2y ; dy*ox: +e2z ;
    #                      dy*oz: -e2x ; dz*ox: -e2y ; dz*oy: +e2x
    w[7, 1] = -e2[:, 2]
    w[8, 1] = e2[:, 1]
    w[9, 1] = e2[:, 2]
    w[10, 1] = -e2[:, 0]
    w[11, 1] = -e2[:, 1]
    w[12, 1] = e2[:, 0]
    w[4:7, 1] = -cross(e2, v0).T
    # v*det: d.(o x e0): dx*oy: +e0z ; dx*oz: -e0y ; dy*ox: -e0z ;
    #                    dy*oz: +e0x ; dz*ox: +e0y ; dz*oy: -e0x
    w[7, 2] = e0[:, 2]
    w[8, 2] = -e0[:, 1]
    w[9, 2] = -e0[:, 2]
    w[10, 2] = e0[:, 0]
    w[11, 2] = e0[:, 1]
    w[12, 2] = -e0[:, 0]
    w[4:7, 2] = -cross(v0, e0).T
    # t*det: o-linear coefs n = e0 x e2, const -v0.n
    n = cross(e0, e2)
    w[1:4, 3] = n.T
    w[0, 3] = -(v0 * n).sum(-1)
    return w.reshape(13, 4 * nt)


def prep_scene(scene: Scene) -> SceneArrays:
    f32 = np.float32
    tri = scene.triangles.astype(f32).reshape(-1, 3, 3)
    v0 = tri[:, 0]
    e0 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e0, e2).astype(f32)
    with np.errstate(invalid="ignore", divide="ignore"):
        n = n / np.sqrt((n * n).sum(-1, keepdims=True))
    n = np.nan_to_num(n)
    nq = scene.n_squares
    return SceneArrays(
        sphere_centers=scene.sphere_centers.astype(f32).reshape(-1, 3),
        square_k=(scene.square_kj[:, 0] if nq else np.zeros(0)).astype(f32),
        square_z=(scene.square_kj[:, 1] + 4.0 if nq else np.zeros(0)).astype(f32),
        tri_v0=v0, tri_e0=e0, tri_e2=e2, tri_n=n,
        tri_w=_triangle_weights(v0, e0, e2),
        lights=scene.lights.astype(f32).reshape(-1, 4),
    )


class TraceResult(NamedTuple):
    t: jnp.ndarray         # (R,) hit distance (t_init when miss)
    normal: jnp.ndarray    # (R, 3)
    material: jnp.ndarray  # (R,) int32: 0 miss, 1 floor, 2 mirror-sphere,
                           #             3 square/diffuse-sphere, 4 triangle



def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def trace_ray(o, d, scn: SceneArrays, t_init=_BIG, quirks: Quirks = DEFAULT,
              sphere_material: int = 3, triangles: bool = True,
              tri_override=None) -> TraceResult:
    """Closest-hit query for a ray batch o/d of shape (..., 3).

    ``t_init`` reproduces the lmem variants' caller-initialised max distance
    (SURVEY.md section 2 #6); plain variants pass the default 1e9.
    ``sphere_material`` is 2 (mirror) in the simple tracer (spt.ocl:68) and
    3 (diffuse) in all super tracers (pathtracer.ocl:103).
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    R = ox.shape

    t = jnp.broadcast_to(jnp.asarray(t_init, jnp.float32), R)
    m = jnp.zeros(R, jnp.int32)
    nx = jnp.zeros(R, jnp.float32)
    ny = jnp.zeros(R, jnp.float32)
    nz = jnp.zeros(R, jnp.float32)
    needs_norm = jnp.zeros(R, bool)   # sphere normals normalised at the end
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    inv_dz = one / dz

    # --- floor ---
    p = -oz * inv_dz
    hit = (p > _EPS) & (p < t)
    t = jnp.where(hit, p, t)
    m = jnp.where(hit, 1, m)
    nx = jnp.where(hit, zero, nx)
    ny = jnp.where(hit, zero, ny)
    nz = jnp.where(hit, one, nz)
    needs_norm = needs_norm & ~hit

    # --- squares ---
    for k, z in zip(scn.square_k, scn.square_z):
        rd = (np.float32(z) - oz) * inv_dz
        ix = ox + dx * rd
        iy = oy + dy * rd
        ok = (rd < t) & (jnp.abs(np.float32(k) - ix) < 1.0) & (jnp.abs(iy) < 1.0)
        if not quirks.accept_negative_t:
            ok = ok & (rd > _EPS)
        t = jnp.where(ok, rd, t)
        m = jnp.where(ok, 3, m)
        nx = jnp.where(ok, zero, nx)
        ny = jnp.where(ok, zero, ny)
        nz = jnp.where(ok, one, nz)
        needs_norm = needs_norm & ~ok

    # --- spheres --- (fori scan over a constant center table; each
    # iteration broadcasts 3 scalars against the ray lanes - no (R, Ns)
    # temporaries, compact HLO)
    if scn.sphere_centers.shape[0]:
        centers = jnp.asarray(scn.sphere_centers)

        def sphere_body(i, carry):
            t, m, nx, ny, nz, needs = carry
            c = jax.lax.dynamic_slice(centers, (i, 0), (1, 3))[0]
            px, py, pz = ox - c[0], oy - c[1], oz - c[2]
            b = _dot3(px, py, pz, dx, dy, dz)
            cc = _dot3(px, py, pz, px, py, pz) - one
            q = b * b - cc
            s = -b - jnp.sqrt(jnp.maximum(q, zero))
            ok = (q > zero) & (s < t) & (s > _EPS)
            t = jnp.where(ok, s, t)
            m = jnp.where(ok, sphere_material, m)
            nx = jnp.where(ok, px + dx * s, nx)
            ny = jnp.where(ok, py + dy * s, ny)
            nz = jnp.where(ok, pz + dz * s, nz)
            needs = needs | ok
            return t, m, nx, ny, nz, needs

        t, m, nx, ny, nz, needs_norm = jax.lax.fori_loop(
            0, scn.sphere_centers.shape[0], sphere_body,
            (t, m, nx, ny, nz, needs_norm))

    # --- triangles ---
    if tri_override is not None:
        t, m, nx, ny, nz, needs_norm = tri_override(
            o, d, t, m, nx, ny, nz, needs_norm)
    elif triangles and 0 < scn.tri_v0.shape[0] < _MXU_MIN_TRIANGLES:
        # fori scan, DIVISION-FREE: validity and the running-min comparison
        # are evaluated on det-scaled quantities (sign-adjusted so the
        # denominator is positive); the best distance is carried as a
        # (numerator, denominator) pair and divided once after the loop.
        table = jnp.asarray(_tri_table(scn))
        one = jnp.float32(1.0)
        bn, bd = t, jnp.ones_like(t)

        def tri_body(i, carry):
            bn, bd, m, nx, ny, nz, needs = carry
            r = jax.lax.dynamic_slice(table, (i, 0), (1, 12))[0]
            det, un, vn, tn = _mt_quads_scalar(ox, oy, oz, dx, dy, dz, r)
            sg = jnp.where(det >= 0, one, -one)
            dd = det * sg
            un_s = un * sg
            vn_s = vn * sg
            tn_s = tn * sg
            ok = ((dd >= _EPS) & (un_s >= 0.0) & (un_s <= dd)
                  & (vn_s >= 0.0) & (un_s + vn_s <= dd))
            if not quirks.accept_negative_t:
                ok = ok & (tn_s > _EPS * dd)
            ok = ok & (tn_s * bd < bn * dd)
            bn = jnp.where(ok, tn_s, bn)
            bd = jnp.where(ok, dd, bd)
            m = jnp.where(ok, 4, m)
            nx = jnp.where(ok, r[9], nx)
            ny = jnp.where(ok, r[10], ny)
            nz = jnp.where(ok, r[11], nz)
            needs = needs & ~ok
            return bn, bd, m, nx, ny, nz, needs

        bn, bd, m, nx, ny, nz, needs_norm = jax.lax.fori_loop(
            0, scn.tri_v0.shape[0], tri_body,
            (bn, bd, m, nx, ny, nz, needs_norm))
        t = bn / bd
    elif triangles and scn.tri_v0.shape[0] >= _MXU_MIN_TRIANGLES:
        # MXU path: all pair scalars from one matmul fused with the epilogue
        # and min/argmin inside a Pallas kernel (VMEM-resident); the merge is
        # equivalent to the sequential scan (strict-< running best)
        from .pallas_tri import triangle_closest
        shape = o.shape[:-1]
        tt, idx = triangle_closest(o.reshape(-1, 3), d.reshape(-1, 3),
                                   scn, quirks)
        tt = tt.reshape(shape)
        tn = jnp.asarray(scn.tri_n)[idx].reshape(shape + (3,))
        ok = tt < t
        t = jnp.where(ok, tt, t)
        m = jnp.where(ok, 4, m)
        nx = jnp.where(ok, tn[..., 0], nx)
        ny = jnp.where(ok, tn[..., 1], ny)
        nz = jnp.where(ok, tn[..., 2], nz)
        needs_norm = needs_norm & ~ok
    inv_len = jnp.where(
        needs_norm,
        jax.lax.rsqrt(jnp.maximum(_dot3(nx, ny, nz, nx, ny, nz),
                                  jnp.float32(1e-30))),
        one)
    normal = jnp.stack([nx * inv_len, ny * inv_len, nz * inv_len], axis=-1)
    return TraceResult(t=t, normal=normal, material=m)


def any_hit(o, d, scn: SceneArrays, t_limit=_BIG, quirks: Quirks = DEFAULT,
            triangles: bool = True):
    """Occlusion query: does any primitive hit with t < t_limit?

    Matches the reference's shadow test, which calls full TraceRay and checks
    material != 0 (pathtracer.ocl:180).  The plain super tracer re-initialises
    t to 1e9 inside TraceRay so *any* hit occludes, even beyond the light;
    the bidirectional/metropolis variants pass the light distance as the cap
    - expressed here via ``t_limit`` (scalar or per-ray array).
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    tl = jnp.asarray(t_limit, jnp.float32)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    inv_dz = one / dz

    p = -oz * inv_dz
    occ = (p > _EPS) & (p < tl)

    for k, z in zip(scn.square_k, scn.square_z):
        rd = (np.float32(z) - oz) * inv_dz
        ix = ox + dx * rd
        iy = oy + dy * rd
        ok = (rd < tl) & (jnp.abs(np.float32(k) - ix) < 1.0) & (jnp.abs(iy) < 1.0)
        if not quirks.accept_negative_t:
            ok = ok & (rd > _EPS)
        occ = occ | ok

    if scn.sphere_centers.shape[0]:
        centers = jnp.asarray(scn.sphere_centers)

        def sphere_body(i, occ):
            c = jax.lax.dynamic_slice(centers, (i, 0), (1, 3))[0]
            px, py, pz = ox - c[0], oy - c[1], oz - c[2]
            b = _dot3(px, py, pz, dx, dy, dz)
            cc = _dot3(px, py, pz, px, py, pz) - one
            q = b * b - cc
            s = -b - jnp.sqrt(jnp.maximum(q, zero))
            return occ | ((q > zero) & (s < tl) & (s > _EPS))

        occ = jax.lax.fori_loop(0, scn.sphere_centers.shape[0], sphere_body, occ)

    if triangles and scn.tri_v0.shape[0] >= _MXU_MIN_TRIANGLES:
        # any valid hit < limit iff the minimum valid distance is < limit
        from .pallas_tri import triangle_closest
        shape = o.shape[:-1]
        tt, _ = triangle_closest(o.reshape(-1, 3), d.reshape(-1, 3),
                                 scn, quirks)
        occ = occ | (tt.reshape(shape) < t_limit)
    elif triangles and scn.tri_v0.shape[0]:
        # division-free occlusion: all conditions on det-scaled quantities
        table = jnp.asarray(_tri_table(scn))
        one = jnp.float32(1.0)

        def tri_body(i, occ):
            r = jax.lax.dynamic_slice(table, (i, 0), (1, 12))[0]
            det, un, vn, tn = _mt_quads_scalar(ox, oy, oz, dx, dy, dz, r)
            sg = jnp.where(det >= 0, one, -one)
            dd = det * sg
            un_s = un * sg
            vn_s = vn * sg
            tn_s = tn * sg
            ok = ((dd >= _EPS) & (un_s >= 0.0) & (un_s <= dd)
                  & (vn_s >= 0.0) & (un_s + vn_s <= dd)
                  & (tn_s < tl * dd))
            if not quirks.accept_negative_t:
                ok = ok & (tn_s > _EPS * dd)
            return occ | ok

        occ = jax.lax.fori_loop(0, scn.tri_v0.shape[0], tri_body, occ)

    return occ


def _tri_table(scn: SceneArrays) -> np.ndarray:
    """(Nt, 12) packed triangle constants: v0, e0, e2, unit normal."""
    return np.concatenate(
        [scn.tri_v0, scn.tri_e0, scn.tri_e2, scn.tri_n], axis=1
    ).astype(np.float32)


def _mt_quads_scalar(ox, oy, oz, dx, dy, dz, r):
    """Moller-Trumbore det-scaled scalars (det, u*det, v*det, t*det) for one
    packed triangle row against the ray lanes - no divisions."""
    pvx = dy * r[8] - dz * r[7]
    pvy = dz * r[6] - dx * r[8]
    pvz = dx * r[7] - dy * r[6]
    det = _dot3(r[3], r[4], r[5], pvx, pvy, pvz)
    tvx, tvy, tvz = ox - r[0], oy - r[1], oz - r[2]
    un = _dot3(tvx, tvy, tvz, pvx, pvy, pvz)
    qvx = tvy * r[5] - tvz * r[4]
    qvy = tvz * r[3] - tvx * r[5]
    qvz = tvx * r[4] - tvy * r[3]
    vn = _dot3(dx, dy, dz, qvx, qvy, qvz)
    tn = _dot3(r[6], r[7], r[8], qvx, qvy, qvz)
    return det, un, vn, tn


def _mt_test(ox, oy, oz, dx, dy, dz, r, quirks: Quirks):
    """Moller-Trumbore validity + distance for one packed triangle row ``r``
    against the ray lanes.  Returns (ok, rd); caller applies the running-t
    comparison."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    v0x, v0y, v0z = r[0], r[1], r[2]
    e0x, e0y, e0z = r[3], r[4], r[5]
    e2x, e2y, e2z = r[6], r[7], r[8]
    # pvec = d x e2
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = _dot3(e0x, e0y, e0z, pvx, pvy, pvz)
    ok = jnp.abs(det) >= _EPS
    inv = one / jnp.where(ok, det, one)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = _dot3(tvx, tvy, tvz, pvx, pvy, pvz) * inv
    ok = ok & (u >= zero) & (u <= one)
    # qvec = tvec x e0
    qvx = tvy * e0z - tvz * e0y
    qvy = tvz * e0x - tvx * e0z
    qvz = tvx * e0y - tvy * e0x
    v = _dot3(dx, dy, dz, qvx, qvy, qvz) * inv
    ok = ok & (v >= zero) & (u + v <= one)
    rd = _dot3(e2x, e2y, e2z, qvx, qvy, qvz) * inv
    if not quirks.accept_negative_t:
        ok = ok & (rd > _EPS)
    return ok, rd


# ---------------------------------------------------------------------------
# MXU triangle path: one (R, 13) @ (13, 4*Nt) matmul + elementwise epilogue

# Triangle-count threshold above which the Pallas MXU kernel replaces the
# fused VPU scan.  Measured on one v5e at 1024^2/256spp with the 96-triangle
# reference scene: scan 108 Mpaths/s, Pallas MXU 35, XLA MXU 17 - the scan's
# full fusion (zero HBM temporaries) beats a K=16 matmul until the triangle
# count is large enough to amortise the feature-array round-trip, so the
# MXU path is reserved for big meshes.
_MXU_MIN_TRIANGLES = 2048


def _ray_features(ox, oy, oz, dx, dy, dz):
    """(R, 13) feature vector (see _triangle_weights)."""
    one = jnp.ones_like(ox)
    return jnp.stack([
        one, ox, oy, oz, dx, dy, dz,
        dx * oy, dx * oz, dy * ox, dy * oz, dz * ox, dz * oy,
    ], axis=-1)


def _mxu_quads(ox, oy, oz, dx, dy, dz, scn: SceneArrays):
    """(R, Nt) each of (det, u*det, v*det, t*det)."""
    nt = scn.tri_v0.shape[0]
    f = _ray_features(ox, oy, oz, dx, dy, dz)
    q = jnp.dot(f, jnp.asarray(scn.tri_w),
                preferred_element_type=jnp.float32)     # (R, 4*Nt)
    q = q.reshape(q.shape[:-1] + (4, nt))
    return q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]


def _mxu_valid(det, un, vn, tn, quirks: Quirks):
    """Validity + distance from the quad scalars.  Conditions are evaluated
    against det-scaled quantities where the sign allows, avoiding a divide
    per pair: u in [0,1] etc. hold iff (u*det) and det agree in sign etc."""
    ok = jnp.abs(det) >= _EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    u = un * inv
    v = vn * inv
    rd = tn * inv
    ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    if not quirks.accept_negative_t:
        ok = ok & (rd > _EPS)
    return ok, rd




def _cross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


