"""MXU-formulated dense VLP gather (Pallas kernel).

The gather (bidirectionalpathtracer.ocl:166-187, shared by the Metropolis
render pass) is, per (shading point, VLP) pair with d = |p - x|:

    illum += relu(n . (p - x)) / d * min(I / d^2, 1)

Both pair scalars are bilinear in (ray features) x (VLP constants):

    a = n.p - (n.x)                      (lambertian numerator * d)
    b = |p|^2 - 2 x.p + |x|^2            (d^2)

so one ray-feature matrix F (R, 16) against two weight matrices (16, V)
yields a and b for ALL pairs as MXU matmuls, leaving a 7-op VPU epilogue

    r = rsqrt(max(b, eps));  contrib = relu(a) * min(I * r^3, r)

versus ~17 VPU ops/pair in the fused XLA scan (ops/vlp.py::gather_vlps).
Everything tiles in VMEM - the (R, V) pair matrices never touch HBM (the
failure mode of the plain-XLA matmul formulation, docs/PERF.md).

Precision note: the expanded |p|^2 - 2x.p + |x|^2 form cancels for close
pairs exactly like the existing scan (which uses the same expansion), so
agreement with the naive oracle carries the same ~1e-4 tolerance class
(tests/test_vlp.py).  Zero-intensity VLPs and padded rows drop out
algebraically (I = 0 -> min(I*r^3, r) = 0), so no masks are needed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = 16          # feature width (9 used, padded for lane alignment)
_EPS = np.float32(1e-12)


def _features(x, n):
    """(R, 16) ray features [n, n.x, x, |x|^2, 1, 0...]."""
    ndx = jnp.sum(n * x, axis=-1, keepdims=True)
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    one = jnp.ones_like(ndx)
    zero = jnp.zeros(x.shape[:-1] + (_F - 9,), jnp.float32)
    return jnp.concatenate([n, ndx, x, x2, one, zero], axis=-1)


def _weights(vlps):
    """(16, V) each for the a- and b-columns, plus (1, V) intensities."""
    p = vlps[:, :3]
    vi = jnp.maximum(vlps[:, 3], 0.0)
    p2 = jnp.sum(p * p, axis=-1)
    nv = vlps.shape[0]
    zero = jnp.zeros((nv,), jnp.float32)
    wa = jnp.stack([p[:, 0], p[:, 1], p[:, 2], -jnp.ones_like(p2)]
                   + [zero] * (_F - 4), axis=0)
    wb = jnp.stack([zero, zero, zero, zero,
                    -2.0 * p[:, 0], -2.0 * p[:, 1], -2.0 * p[:, 2],
                    jnp.ones_like(p2), p2] + [zero] * (_F - 9), axis=0)
    return wa, wb, vi[None, :]


def _kernel(f_ref, wa_ref, wb_ref, vi_ref, out_ref, *, tile_v: int,
            n_vtiles: int, precision):
    f = f_ref[:]                                   # (TILE_R, 16)

    def body(j, acc):
        sl = pl.ds(j * tile_v, tile_v)
        # HIGHEST = Mosaic's native fp32 contraction: the b = |p|^2 - 2x.p
        # + |x|^2 expansion cancels catastrophically under the MXU's default
        # single-pass bf16 input rounding (measured 1e4 relative error).
        # Pallas dots accept only DEFAULT/HIGHEST (mosaic/lowering.py).
        a = jnp.dot(f, wa_ref[:, sl], preferred_element_type=jnp.float32,
                    precision=precision)
        b = jnp.dot(f, wb_ref[:, sl], preferred_element_type=jnp.float32,
                    precision=precision)
        r = jax.lax.rsqrt(jnp.maximum(b, _EPS))
        t = jnp.minimum(vi_ref[:, sl] * (r * r * r), r)
        c = jnp.maximum(a, 0.0) * t
        return acc + jnp.sum(c, axis=1, keepdims=True)

    out_ref[:] = jax.lax.fori_loop(
        0, n_vtiles, body, jnp.zeros(out_ref.shape, jnp.float32))


def gather_vlps_mxu(x, n, vlps, tile_r: int = 512, tile_v: int = 1024,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST):
    """Dense VLP gather on the MXU; same contract as ops/vlp.gather_vlps
    for (R, 3) inputs: returns (R,) float32 illumination."""
    shape = x.shape[:-1]
    x = x.reshape(-1, 3)
    n = n.reshape(-1, 3)
    R = x.shape[0]
    V = vlps.shape[0]
    tile_v = min(tile_v, max(128, V))
    f = _features(x, n)
    wa, wb, vi = _weights(vlps)

    rp = -(-R // tile_r) * tile_r
    vp = -(-V // tile_v) * tile_v
    f = jnp.pad(f, ((0, rp - R), (0, 0)))
    wa = jnp.pad(wa, ((0, 0), (0, vp - V)))
    wb = jnp.pad(wb, ((0, 0), (0, vp - V)))
    vi = jnp.pad(vi, ((0, 0), (0, vp - V)))

    out = pl.pallas_call(
        functools.partial(_kernel, tile_v=tile_v, n_vtiles=vp // tile_v,
                          precision=precision),
        grid=(rp // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, _F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_F, vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_F, vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * vp * _F + 7 * rp * vp,
            bytes_accessed=rp * _F * 4 + 3 * _F * vp * 4 + rp * 4,
            transcendentals=rp * vp,
        ),
        interpret=interpret,
    )(f, wa, wb, vi)
    return out[:R, 0].reshape(shape)
