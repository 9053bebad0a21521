"""Microbenchmarks for the take-list blocked-scan primitives.

Validates on the real chip, then times:
  1. flag prepass: per-block any-lane reduction kept VECTOR-ONLY
     (keepdims full reduce + lane-iota select), flags staged in VMEM and
     moved to SMEM with ONE async copy,
  2. branch-free scalar take-list build (dead writes overwritten),
  3. dynamic-trip fori over the take-list,
vs the shipped per-block (jnp.any -> lax.cond) pattern, and vs a
scalar-predicate cond, to decompose the per-block sync cost.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 128          # fake blocks
REPS = 200        # inner repetition to amortize dispatch


def _flags_rows(x_ref, nb):
    """Vector-only per-block any flags: returns list of (1, 128) i32 rows."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    rows = []
    for g in range(0, nb, 128):
        row = jnp.zeros((1, 128), jnp.int32)
        for l in range(min(128, nb - g)):
            b = g + l
            thr = np.float32(b) / np.float32(nb)
            hit = (x_ref[...] > thr).astype(jnp.int32)
            anyb = jnp.max(hit, axis=(0, 1), keepdims=True)  # (1,1) vector
            row = row | jnp.where(lane == l, anyb, 0)
        rows.append(row)
    return rows


def kernel_takelist(x_ref, o_ref, cnt_ref, flags_v, flags_s, list_s, fsem):
    """Full pipeline: flags -> one VMEM->SMEM copy -> branch-free list ->
    dynamic-trip accumulation loop."""

    def body(r, acc):
        rows = _flags_rows(x_ref, NB)
        for g, row in enumerate(rows):
            flags_v[pl.ds(g, 1), :] = row
        cp = pltpu.make_async_copy(flags_v, flags_s, fsem)
        cp.start()
        cp.wait()

        def build(b, cnt):
            list_s[0, cnt] = b
            return cnt + flags_s[b // 128, b % 128]

        cnt = jax.lax.fori_loop(0, NB, build, jnp.int32(0))

        def scan(i, a):
            b = list_s[0, i]
            return a + jnp.full((8, 128), 1e-6, jnp.float32) * b.astype(jnp.float32)

        acc = jax.lax.fori_loop(0, cnt, scan, acc, unroll=False)
        cnt_ref[0, 0] = cnt
        return acc

    o_ref[...] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), jnp.float32))


def kernel_anycond(x_ref, o_ref, cnt_ref):
    """Shipped pattern: per-block jnp.any -> lax.cond."""

    def body(r, acc):
        def blk(b, a):
            thr = b.astype(jnp.float32) / np.float32(NB)
            hit = x_ref[...] > thr

            def do(a):
                return a + jnp.full((8, 128), 1e-6, jnp.float32)

            return jax.lax.cond(jnp.any(hit), do, lambda a: a, a)

        return jax.lax.fori_loop(0, NB, blk, acc)

    o_ref[...] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), jnp.float32))
    cnt_ref[0, 0] = 0


def kernel_scalarcond(x_ref, s_ref, o_ref, cnt_ref):
    """Per-block cond with an SMEM scalar predicate (no vector reduce)."""

    def body(r, acc):
        def blk(b, a):
            def do(a):
                return a + jnp.full((8, 128), 1e-6, jnp.float32)

            return jax.lax.cond(s_ref[0, b] != 0, do, lambda a: a, a)

        return jax.lax.fori_loop(0, NB, blk, acc)

    o_ref[...] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), jnp.float32))
    cnt_ref[0, 0] = 0


def kernel_noop(x_ref, o_ref, cnt_ref):
    """Loop overhead floor: same loops, no cond."""

    def body(r, acc):
        def blk(b, a):
            return a + jnp.full((8, 128), 1e-6, jnp.float32)

        return jax.lax.fori_loop(0, NB, blk, acc)

    o_ref[...] = jax.lax.fori_loop(0, REPS, body, jnp.zeros((8, 128), jnp.float32))
    cnt_ref[0, 0] = 0


def run(name, fn, *args, interpret=False):
    out = jax.jit(functools.partial(fn, interpret=interpret))
    r = jax.block_until_ready(out(*args))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = out(*args)
        np.asarray(r[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_block = best / REPS / NB * 1e9
    print(f"{name}: best {best * 1e3:.2f} ms -> {per_block:.0f} ns/block "
          f"(cnt={int(np.asarray(r[1])[0, 0])}, out[0,0]={float(np.asarray(r[0])[0, 0]):.4g})",
          flush=True)
    return best


def main(interpret=False):
    x = jnp.asarray(np.random.RandomState(0).rand(8, 128), jnp.float32)
    # half the "blocks" hit
    x = x * 0.5

    def mk(kernel, extra_in=(), scratch=()):
        def f(*args, interpret=False):
            return pl.pallas_call(
                kernel,
                out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                           pl.BlockSpec(memory_space=pltpu.SMEM)),
                out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                           jax.ShapeDtypeStruct((1, 1), jnp.int32)),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] +
                         [pl.BlockSpec(memory_space=pltpu.SMEM)] * len(extra_in),
                scratch_shapes=list(scratch),
                interpret=interpret,
            )(*args)
        return f

    fr = -(-NB // 128)
    take = mk(kernel_takelist,
              scratch=(pltpu.VMEM((fr, 128), jnp.int32),
                       pltpu.SMEM((fr, 128), jnp.int32),
                       pltpu.SMEM((1, NB + 1), jnp.int32),
                       pltpu.SemaphoreType.DMA))
    anyc = mk(kernel_anycond)
    flags_half = jnp.asarray((np.arange(NB) % 2 == 0).astype(np.int32)[None],
                             jnp.int32)
    scal = mk(kernel_scalarcond, extra_in=(flags_half,))
    noop = mk(kernel_noop)

    print(f"NB={NB} blocks, REPS={REPS}", flush=True)
    run("noop-loop   ", noop, x, interpret=interpret)
    run("any+cond    ", anyc, x, interpret=interpret)
    run("scalar-cond ", scal, x, flags_half, interpret=interpret)
    run("take-list   ", take, x, interpret=interpret)


if __name__ == "__main__":
    import sys
    main(interpret="--interpret" in sys.argv)
