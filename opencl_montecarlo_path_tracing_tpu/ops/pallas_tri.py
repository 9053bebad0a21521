"""Pallas TPU kernel: fused MXU triangle intersection.

The MXU formulation of Moller-Trumbore (ops/intersect.py::_triangle_weights)
expressed through XLA materialises the (rays, 4*Nt) matmul output in HBM
(measured 6x slower than the VPU scan).  This kernel keeps everything in
VMEM per ray tile: feature matmul on the MXU, validity epilogue and the
min/argmin reduction on the VPU, emitting only (t, index) per ray.

One kernel serves closest-hit and any-hit queries: the minimum valid
distance is < t_limit iff any valid distance is.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quirks import Quirks

_EPS = np.float32(0.01)
_INF = np.float32(np.inf)

TILE_R = 1024  # rays per grid step (8 x 128 sublane/lane tiles x 8)


def _kernel(f_ref, w_ref, t_ref, idx_ref, *, nt: int, ntp: int,
            accept_negative_t: bool):
    f = f_ref[:]                      # (TILE_R, 16)
    w = w_ref[:]                      # (16, 4 * ntp)
    q = jnp.dot(f, w, preferred_element_type=jnp.float32)
    det = q[:, 0 * ntp:0 * ntp + ntp]
    un = q[:, 1 * ntp:1 * ntp + ntp]
    vn = q[:, 2 * ntp:2 * ntp + ntp]
    tn = q[:, 3 * ntp:3 * ntp + ntp]

    ok = jnp.abs(det) >= _EPS         # zero-padded tris fail here
    inv = 1.0 / jnp.where(ok, det, 1.0)
    u = un * inv
    v = vn * inv
    rd = tn * inv
    ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    if not accept_negative_t:
        ok = ok & (rd > _EPS)
    rd = jnp.where(ok, rd, _INF)
    idx = jnp.argmin(rd, axis=-1).astype(jnp.int32)
    # outputs are stored as one native (8, TILE_R // 8) register tile
    t_ref[:, :] = jnp.min(rd, axis=-1).reshape(8, TILE_R // 8)
    idx_ref[:, :] = idx.reshape(8, TILE_R // 8)


@functools.partial(jax.jit, static_argnames=("nt", "ntp",
                                             "accept_negative_t",
                                             "interpret"))
def _run(features, w, nt, ntp, accept_negative_t, interpret):
    n_tiles = features.shape[0] // TILE_R
    kernel = functools.partial(_kernel, nt=nt, ntp=ntp,
                               accept_negative_t=accept_negative_t)
    t, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_R, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * ntp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_R // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_R // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 8, TILE_R // 8), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, TILE_R // 8), jnp.int32),
        ],
        interpret=interpret,
    )(features, w)
    return t.reshape(-1), idx.reshape(-1)


def _padded_weights(scn) -> tuple[np.ndarray, int]:
    """(16, 4*ntp) weights: feature dim padded 13->16, triangle count padded
    to a lane-friendly multiple of 32 with zero rows (det==0 -> invalid)."""
    nt = scn.tri_v0.shape[0]
    ntp = max(32, -(-nt // 32) * 32)
    w = np.zeros((16, 4 * ntp), np.float32)
    w13 = scn.tri_w.reshape(13, 4, nt)
    for q in range(4):
        w[:13, q * ntp:q * ntp + nt] = w13[:, q, :]
    return w, ntp


def triangle_closest(o, d, scn, quirks: Quirks):
    """(best_t (R,), best_index (R,)) - inf / arbitrary index on miss."""
    from .intersect import _ray_features   # shared feature definition
    R = o.shape[0]
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    f13 = _ray_features(ox, oy, oz, dx, dy, dz)
    pad_r = (-R) % TILE_R
    f = jnp.pad(f13, ((0, pad_r), (0, 3)))
    w, ntp = _padded_weights(scn)
    interpret = jax.default_backend() != "tpu"
    t, idx = _run(f, jnp.asarray(w), scn.tri_v0.shape[0], ntp,
                  bool(quirks.accept_negative_t), interpret)
    return t[:R], idx[:R]
