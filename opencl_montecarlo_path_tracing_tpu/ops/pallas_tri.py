"""Pallas TPU kernel: fused MXU triangle intersection.

The MXU formulation of Moller-Trumbore (ops/intersect.py::_triangle_weights)
expressed through XLA materialises the (rays, 4*Nt) matmul output in HBM
(measured 6x slower than the VPU scan).  This kernel keeps everything in
VMEM per ray tile: feature matmuls on the MXU, validity epilogue and the
min/argmin reduction on the VPU, emitting only (t, index) per ray.
Triangles are processed in chunks inside the kernel so VMEM holds one
(TILE_R, CHUNK) quad at a time - large meshes (tested to 20k+ triangles)
stay within the ~128 MB budget.

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

TILE_R = 1024      # rays per grid step
TRI_CHUNK = 512    # triangles per in-kernel step


def _kernel(f_ref, w_ref, t_ref, idx_ref, *, ntp: int,
            accept_negative_t: bool):
    f = f_ref[:]                      # (TILE_R, 16)
    n_chunks = ntp // TRI_CHUNK

    def chunk(c, carry):
        best_t, best_i = carry
        # w_ref: (4, 16, ntp); per-quad chunk matmuls on the MXU
        col = c * TRI_CHUNK
        # HIGHEST = Mosaic's native fp32 contraction; the MXU's default
        # single-pass bf16 input rounding corrupts the det/u/v/t quads for
        # real-scale vertex coordinates (same failure measured on the VLP
        # gather, ops/pallas_vlp.py) and was never exercised on hardware by
        # the CPU interpret-mode tests.
        hi = jax.lax.Precision.HIGHEST
        det = jnp.dot(f, w_ref[0, :, pl.ds(col, TRI_CHUNK)],
                      preferred_element_type=jnp.float32, precision=hi)
        un = jnp.dot(f, w_ref[1, :, pl.ds(col, TRI_CHUNK)],
                     preferred_element_type=jnp.float32, precision=hi)
        vn = jnp.dot(f, w_ref[2, :, pl.ds(col, TRI_CHUNK)],
                     preferred_element_type=jnp.float32, precision=hi)
        tn = jnp.dot(f, w_ref[3, :, pl.ds(col, TRI_CHUNK)],
                     preferred_element_type=jnp.float32, precision=hi)

        ok = jnp.abs(det) >= _EPS     # zero-padded tris fail here
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = un * inv
        v = vn * inv
        rd = tn * inv
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        if not accept_negative_t:
            ok = ok & (rd > _EPS)
        rd = jnp.where(ok, rd, _INF)
        ci = jnp.argmin(rd, axis=-1).astype(jnp.int32)
        ct = jnp.min(rd, axis=-1)
        better = ct < best_t
        best_t = jnp.where(better, ct, best_t)
        best_i = jnp.where(better, ci + col, best_i)
        return best_t, best_i

    best_t = jnp.full((TILE_R,), _INF, jnp.float32)
    best_i = jnp.zeros((TILE_R,), jnp.int32)
    best_t, best_i = jax.lax.fori_loop(0, n_chunks, chunk, (best_t, best_i))
    # outputs are stored as one native (8, TILE_R // 8) register tile
    t_ref[:, :] = best_t.reshape(8, TILE_R // 8)
    idx_ref[:, :] = best_i.reshape(8, TILE_R // 8)


@functools.partial(jax.jit, static_argnames=("ntp", "accept_negative_t",
                                             "interpret"))
def _run(features, w, ntp, accept_negative_t, interpret):
    n_tiles = features.shape[0] // TILE_R
    kernel = functools.partial(_kernel, ntp=ntp,
                               accept_negative_t=accept_negative_t)
    t, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_R, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 16, ntp), lambda i: (0, 0, 0),
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
    """(4, 16, ntp) weights: feature dim padded 13->16, triangle count
    padded to a multiple of TRI_CHUNK with zero rows (det==0 -> invalid)."""
    nt = scn.tri_v0.shape[0]
    ntp = max(TRI_CHUNK, -(-nt // TRI_CHUNK) * TRI_CHUNK)
    w = np.zeros((4, 16, ntp), np.float32)
    w13 = scn.tri_w.reshape(13, 4, nt)
    for q in range(4):
        w[q, :13, :nt] = w13[:, q, :]
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
    t, idx = _run(f, jnp.asarray(w), ntp,
                  bool(quirks.accept_negative_t), interpret)
    return t[:R], jnp.clip(idx[:R], 0, scn.tri_v0.shape[0] - 1)
