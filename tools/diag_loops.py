"""Decompose Mosaic loop overhead: cost per fori iteration vs body size,
unrolling, nesting, and scalar<->vector traffic."""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, x, n_iters, tag):
    out = jax.jit(fn)
    np.asarray(out(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = np.asarray(out(x))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{tag}: {best * 1e3:.2f} ms -> {best / n_iters * 1e9:.0f} ns/iter",
          flush=True)


def make(body_adds, iters, unroll, nest_inner=0):
    def kernel(x_ref, o_ref):
        def body(i, a):
            if nest_inner:
                def inner(j, a):
                    for _ in range(body_adds):
                        a = a * np.float32(0.999) + np.float32(1e-6)
                    return a
                return jax.lax.fori_loop(0, nest_inner, inner, a)
            for _ in range(body_adds):
                a = a * np.float32(0.999) + np.float32(1e-6)
            return a

        acc = jnp.zeros((8, 128), jnp.float32)
        acc = jax.lax.fori_loop(0, iters, body, acc, unroll=unroll)
        o_ref[...] = acc + x_ref[...]

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
    return f


def main():
    x = jnp.zeros((8, 128), jnp.float32)
    # ns per flat iteration for varying body sizes
    for adds in (1, 4, 16, 64):
        timed(make(adds, 25600, False), x, 25600, f"flat fori adds={adds:3d}")
    # fully unrolled inner chunks: outer fori over iters//chunk, chunk
    # unrolled in Python - the planned kernel structure
    def make_chunked(chunk, outer):
        def kernel(x_ref, o_ref):
            def body(i, a):
                for _ in range(chunk):
                    a = a * np.float32(0.999) + np.float32(1e-6)
                return a
            acc = jax.lax.fori_loop(0, outer, body,
                                    jnp.zeros((8, 128), jnp.float32))
            o_ref[...] = acc + x_ref[...]
        return lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    for chunk in (32, 128):
        timed(make_chunked(chunk, 25600 // chunk), x, 25600,
              f"chunk-unroll {chunk} (same 25600 flat ops)")
    # nested (outer 200 x inner 128) like the block loop
    timed(make(1, 200, False, nest_inner=128), x, 25600,
          "nested 200x128 adds=1")
    # scalar -> vector broadcast per iteration
    def kernel_bcast(x_ref, o_ref):
        def body(i, a):
            return a + i.astype(jnp.float32)
        acc = jax.lax.fori_loop(0, 25600, body,
                                jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc + x_ref[...]
    f = lambda x: pl.pallas_call(
        kernel_bcast, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    timed(f, x, 25600, "flat fori + scalar->vec broadcast")

    # per-iteration reduce costs
    def mk_reduce(axis):
        def kernel(x_ref, o_ref):
            def body(i, a):
                if axis == "full":
                    r = jnp.max(a, axis=(0, 1), keepdims=True)
                elif axis == "lane":
                    r = jnp.max(a, axis=1, keepdims=True)
                else:
                    r = jnp.max(a, axis=0, keepdims=True)
                return a + r * np.float32(1e-9)
            acc = jax.lax.fori_loop(0, 6400, body,
                                    jnp.zeros((8, 128), jnp.float32))
            o_ref[...] = acc + x_ref[...]
        return lambda x: pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    for ax in ("full", "lane", "sub"):
        timed(mk_reduce(ax), x, 6400, f"fori + {ax}-reduce")

    # DMA latency: HBM->SMEM 8KB per iteration, dynamic offset
    def kernel_dma(x_ref, tbl_ref, o_ref, scratch, sem):
        def body(i, a):
            cp = pltpu.make_async_copy(
                tbl_ref.at[:, pl.ds((i % 16) * 128, 128)], scratch, sem)
            cp.start()
            cp.wait()
            return a + scratch[0, 0]
        c = jax.lax.fori_loop(0, 6400, body, jnp.float32(0))
        o_ref[...] = x_ref[...] + c
    tbl = jnp.zeros((16, 2048), jnp.float32)
    f = lambda x: pl.pallas_call(
        kernel_dma,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x, tbl)
    timed(f, x, 6400, "fori + 8KB HBM->SMEM DMA")

    # pure scalar loop (SMEM arithmetic only)
    def kernel_scalar(x_ref, o_ref, s_ref):
        def body(i, c):
            s_ref[0, c & 7] = i
            return c + 1
        c = jax.lax.fori_loop(0, 25600, body, jnp.int32(0))
        o_ref[...] = x_ref[...] + c.astype(jnp.float32)
    f = lambda x: pl.pallas_call(
        kernel_scalar,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 8), jnp.int32)],
    )(x)
    timed(f, x, 25600, "scalar fori (SMEM store)")


if __name__ == "__main__":
    main()
