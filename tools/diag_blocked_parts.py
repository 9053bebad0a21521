"""Ablate the take-list blocked scan to find where 170 ms/frame goes.

Variants (monkeypatched, WRONG images - timing only), 20k torus 256^2 x 4:
  full        shipped pipeline (baseline)
  zeroflags   _block_flags replaced by "write zero flags": no slab tests,
              no mat stores; build+scan run on empty flags
              -> isolates the prepass cost
  noscan      _take_list returns 0: prepass+flag DMA run, scan loop empty
              -> isolates build+scan cost
  noslab      slab replaced by a constant compare (no aabb SMEM reads)
              -> isolates the SMEM-scalar->vector broadcast cost
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tools.diag_blocked import big_scene

SIZE, SPP = 256, 4


def bench(fn, key, repeats=3, tag=""):
    t0 = time.perf_counter()
    film = np.asarray(fn(key))
    t_first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    print(f"{tag}: first {t_first:.0f} s, best {min(times) * 1e3:.1f} ms, "
          f"mean {film.mean():.4f}", flush=True)


orig_flags = M._block_flags
orig_take = M._take_list


def zeroflags(tri, ox, oy, oz, dx, dy, dz, neg_t, occ_tl, carry):
    flags_v = tri["flags_v"]
    flags_s = tri["flags_s"]
    fsem = tri["fsem"]
    nb_pad = flags_v.shape[0]
    flags_v[pl.ds(0, nb_pad), :] = jnp.zeros((nb_pad, 1), jnp.int32)
    cp = pltpu.make_async_copy(flags_v, flags_s, fsem)
    cp.start()
    cp.wait()


def noscan(tri):
    return jnp.int32(0)


def noslab(tri, ox, oy, oz, dx, dy, dz, neg_t, occ_tl, carry):
    """Same structure as _block_flags but the per-block test reads no
    SMEM scalars (constant threshold on ray data)."""
    mat = tri["flag_mat"]
    flags_v = tri["flags_v"]
    flags_s = tri["flags_s"]
    fsem = tri["fsem"]
    nb = tri["n_blocks"]
    for g in range(0, nb, 128):
        gn = min(128, nb - g)
        if gn < 128:
            mat[pl.ds(0, 128), :] = jnp.zeros((128, 128), jnp.int32)
        for l in range(gn):
            thr = np.float32(1e4 + g + l)   # unreachable -> flags all 0
            hit = (ox + oy + oz + dx + dy + dz) > thr
            mat[pl.ds(l, 1), :] = jnp.max(hit.astype(jnp.int32), axis=0,
                                          keepdims=True)
        flags_v[pl.ds(g, 128), :] = jnp.max(mat[...], axis=1, keepdims=True)
    cp = pltpu.make_async_copy(flags_v, flags_s, fsem)
    cp.start()
    cp.wait()


def main():
    key = make_key(7)
    scn = big_scene()
    paths = SIZE * SIZE * SPP

    def run(tag):
        fn = jax.jit(lambda k: M.film_super_mega(k, scn, SIZE, SIZE, SPP))
        bench(fn, key, tag=tag)

    run("full     ")
    M._block_flags = zeroflags
    run("zeroflags")
    M._block_flags = orig_flags
    M._take_list = noscan
    run("noscan   ")
    M._take_list = orig_take
    M._block_flags = noslab
    run("noslab   ")
    M._block_flags = orig_flags


if __name__ == "__main__":
    main()
