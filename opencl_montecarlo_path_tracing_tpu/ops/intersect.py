"""Batched primitive intersection (floor / squares / spheres / triangles).

The reference's TraceRay is a per-ray sequential scan over primitive classes
(CLSuperPathTracer/pathtracer.ocl:48-137): floor, then the square bitmap,
then the sphere bitmap, then a Moller-Trumbore loop over triangles, each
accepting a hit only when strictly closer than the best so far.  Because the
position tests do not depend on the running distance, that scan is exactly a
per-class masked min-reduction followed by a class-ordered strict-< merge -
which is how it is expressed here, as dense (n_rays x n_prims) vector math
that XLA fuses onto the VPU with no divergent branches.

Semantics preserved exactly (with Quirks toggles, see core/quirks.py):
  floor   (ocl:65-70):   p = -oz/dz, hit if 0.01 < p (< t for lmem variants),
                         m=1, n=(0,0,1)
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
import jax.numpy as jnp

from ..core.quirks import Quirks, DEFAULT
from ..scene.scene import Scene

_EPS = np.float32(0.01)
_BIG = np.float32(1e9)
_INF = np.float32(np.inf)


class SceneArrays(NamedTuple):
    """Device-resident SoA scene (a jax pytree; shapes static per scene)."""
    sphere_centers: jnp.ndarray  # (Ns, 3)
    square_k: jnp.ndarray        # (Nq,)
    square_z: jnp.ndarray        # (Nq,)  plane height = j + 4
    tri_v0: jnp.ndarray          # (Nt, 3)
    tri_e0: jnp.ndarray          # (Nt, 3)  v1 - v0
    tri_e2: jnp.ndarray          # (Nt, 3)  v2 - v0
    tri_n: jnp.ndarray           # (Nt, 3)  normalize(e0 x e2)
    lights: jnp.ndarray          # (Nl, 4)


def prep_scene(scene: Scene) -> SceneArrays:
    f32 = np.float32
    tri = scene.triangles.astype(f32)
    v0 = tri[:, 0]
    e0 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e0, e2).astype(f32)
    with np.errstate(invalid="ignore", divide="ignore"):
        n = n / np.sqrt((n * n).sum(-1, keepdims=True))
    n = np.nan_to_num(n)
    return SceneArrays(
        sphere_centers=jnp.asarray(scene.sphere_centers, f32),
        square_k=jnp.asarray(scene.square_kj[:, 0] if scene.n_squares else np.zeros(0), f32),
        square_z=jnp.asarray(scene.square_kj[:, 1] + 4.0 if scene.n_squares else np.zeros(0), f32),
        tri_v0=jnp.asarray(v0, f32),
        tri_e0=jnp.asarray(e0, f32),
        tri_e2=jnp.asarray(e2, f32),
        tri_n=jnp.asarray(n, f32),
        lights=jnp.asarray(scene.lights, f32),
    )


class TraceResult(NamedTuple):
    t: jnp.ndarray         # (R,) hit distance (t_init when miss)
    normal: jnp.ndarray    # (R, 3)
    material: jnp.ndarray  # (R,) int32: 0 miss, 1 floor, 2 mirror-sphere,
                           #             3 square/diffuse-sphere, 4 triangle


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


def _floor_hit(o, d, quirks: Quirks):
    p = -o[..., 2] / d[..., 2]
    return p, p > _EPS


def _square_best(o, d, scn: SceneArrays, quirks: Quirks):
    """Min hit distance over squares; (R,). inf when none."""
    rd = (scn.square_z - o[..., 2:3]) / d[..., 2:3]          # (R, Nq)
    ix = o[..., 0:1] + d[..., 0:1] * rd
    iy = o[..., 1:2] + d[..., 1:2] * rd
    ok = (jnp.abs(scn.square_k - ix) < 1.0) & (jnp.abs(iy) < 1.0)
    if not quirks.accept_negative_t:
        ok = ok & (rd > _EPS)
    return jnp.min(jnp.where(ok, rd, _INF), axis=-1)


def _sphere_best(o, d, scn: SceneArrays, quirks: Quirks):
    """(best_t, best_center) over unit spheres; (R,), (R,3)."""
    p = o[..., None, :] - scn.sphere_centers                  # (R, Ns, 3)
    b = _dot(p, d[..., None, :])
    c = _dot(p, p) - 1.0
    q = b * b - c
    s = -b - jnp.sqrt(jnp.maximum(q, 0.0))
    ok = (q > 0.0) & (s > _EPS)
    s = jnp.where(ok, s, _INF)
    idx = jnp.argmin(s, axis=-1)
    best = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
    center = scn.sphere_centers[idx]
    return best, center


def _triangle_best(o, d, scn: SceneArrays, quirks: Quirks):
    """(best_t, best_normal) via Moller-Trumbore; (R,), (R,3)."""
    e0 = scn.tri_e0
    e2 = scn.tri_e2
    pvec = _cross(d[..., None, :], e2)                        # (R, Nt, 3)
    det = _dot(e0, pvec)
    ok = jnp.abs(det) >= _EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvec = o[..., None, :] - scn.tri_v0
    u = _dot(tvec, pvec) * inv
    ok = ok & (u >= 0.0) & (u <= 1.0)
    qvec = _cross(tvec, e0)
    v = _dot(d[..., None, :], qvec) * inv
    ok = ok & (v >= 0.0) & (u + v <= 1.0)
    rd = _dot(e2, qvec) * inv
    if not quirks.accept_negative_t:
        ok = ok & (rd > _EPS)
    rd = jnp.where(ok, rd, _INF)
    idx = jnp.argmin(rd, axis=-1)
    best = jnp.take_along_axis(rd, idx[..., None], axis=-1)[..., 0]
    return best, scn.tri_n[idx]


def trace_ray(o, d, scn: SceneArrays, t_init=_BIG, quirks: Quirks = DEFAULT,
              sphere_material: int = 3,
              triangles: bool = True) -> TraceResult:
    """Closest-hit query for a ray batch o/d of shape (..., 3).

    ``t_init`` reproduces the lmem variants' caller-initialised max distance
    (SURVEY.md section 2 #6); plain variants pass the default 1e9.
    ``sphere_material`` is 2 (mirror) in the simple tracer (spt.ocl:68) and
    3 (diffuse) in all super tracers (pathtracer.ocl:103).
    """
    R = o.shape[:-1]
    t = jnp.broadcast_to(jnp.asarray(t_init, jnp.float32), R)
    m = jnp.zeros(R, jnp.int32)
    up = jnp.zeros(R + (3,), jnp.float32).at[..., 2].set(1.0)
    n = jnp.zeros(R + (3,), jnp.float32)

    # floor (strict class order: each later class must beat the running best)
    p, okf = _floor_hit(o, d, quirks)
    hit = okf & (p < t)
    t = jnp.where(hit, p, t)
    m = jnp.where(hit, 1, m)
    n = jnp.where(hit[..., None], up, n)

    if scn.square_k.shape[0]:
        sq = _square_best(o, d, scn, quirks)
        hit = sq < t
        t = jnp.where(hit, sq, t)
        m = jnp.where(hit, 3, m)
        n = jnp.where(hit[..., None], up, n)

    if scn.sphere_centers.shape[0]:
        sp, center = _sphere_best(o, d, scn, quirks)
        hit = sp < t
        t = jnp.where(hit, sp, t)
        m = jnp.where(hit, sphere_material, m)
        pc = o - center
        sn = pc + d * sp[..., None]
        sn = sn / jnp.sqrt(jnp.sum(sn * sn, axis=-1, keepdims=True))
        n = jnp.where(hit[..., None], sn, n)

    if triangles and scn.tri_v0.shape[0]:
        tt, tn = _triangle_best(o, d, scn, quirks)
        hit = tt < t
        t = jnp.where(hit, tt, t)
        m = jnp.where(hit, 4, m)
        n = jnp.where(hit[..., None], tn, n)

    return TraceResult(t=t, normal=n, material=m)


def any_hit(o, d, scn: SceneArrays, t_limit=_BIG, quirks: Quirks = DEFAULT,
            triangles: bool = True):
    """Occlusion query: does any primitive hit with t < t_limit?

    Matches the reference's shadow test, which calls full TraceRay and checks
    material != 0 (pathtracer.ocl:180).  The plain super tracer re-initialises
    t to 1e9 inside TraceRay so *any* hit occludes, even beyond the light;
    the lmem variants pass the light distance as the cap - expressed here via
    ``t_limit`` (scalar or per-ray array).
    """
    t_limit = jnp.asarray(t_limit, jnp.float32)
    tl = t_limit[..., None] if t_limit.ndim else t_limit  # broadcast vs prim axis
    occluded = jnp.zeros(o.shape[:-1], bool)

    p, okf = _floor_hit(o, d, quirks)
    occluded = occluded | (okf & (p < t_limit))

    if scn.square_k.shape[0]:
        rd = (scn.square_z - o[..., 2:3]) / d[..., 2:3]
        ix = o[..., 0:1] + d[..., 0:1] * rd
        iy = o[..., 1:2] + d[..., 1:2] * rd
        ok = (jnp.abs(scn.square_k - ix) < 1.0) & (jnp.abs(iy) < 1.0)
        if not quirks.accept_negative_t:
            ok = ok & (rd > _EPS)
        occluded = occluded | jnp.any(ok & (rd < tl), axis=-1)

    if scn.sphere_centers.shape[0]:
        pc = o[..., None, :] - scn.sphere_centers
        b = _dot(pc, d[..., None, :])
        c = _dot(pc, pc) - 1.0
        q = b * b - c
        s = -b - jnp.sqrt(jnp.maximum(q, 0.0))
        ok = (q > 0.0) & (s > _EPS)
        occluded = occluded | jnp.any(ok & (s < tl), axis=-1)

    if triangles and scn.tri_v0.shape[0]:
        pvec = _cross(d[..., None, :], scn.tri_e2)
        det = _dot(scn.tri_e0, pvec)
        ok = jnp.abs(det) >= _EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        tvec = o[..., None, :] - scn.tri_v0
        u = _dot(tvec, pvec) * inv
        ok = ok & (u >= 0.0) & (u <= 1.0)
        qvec = _cross(tvec, scn.tri_e0)
        v = _dot(d[..., None, :], qvec) * inv
        ok = ok & (v >= 0.0) & (u + v <= 1.0)
        rd = _dot(scn.tri_e2, qvec) * inv
        if not quirks.accept_negative_t:
            ok = ok & (rd > _EPS)
        occluded = occluded | jnp.any(ok & (rd < tl), axis=-1)

    return occluded
