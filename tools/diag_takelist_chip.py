"""On-chip validation + timing of the take-list blocked scan.

1. correctness: 96-triangle reference scene, blocked (forced) vs SMEM
   megakernel on the chip, content band;
2. correctness: 20k-triangle torus, blocked mega vs the XLA pipeline at
   512^2 (expect only the razor-edge pixel class);
3. throughput: 20k torus at 256^2 x 4 (the VERDICT row) and 512^2 x 4
   (torus in frame).
"""

from __future__ import annotations

import time

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from tools.diag_blocked import big_scene


def bench(fn, key, repeats=3, tag=""):
    t0 = time.perf_counter()
    film = np.asarray(fn(key))
    t_first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{tag}: first {t_first:.1f} s, best {best * 1e3:.1f} ms, "
          f"mean {film.mean():.4f}", flush=True)
    return best, film


def main():
    key = make_key(7)

    # 1. reference scene: blocked vs smem on chip (content band)
    ref = prep_scene(demo_scene()[0])
    kw = dict(width=512, height=512, spp=2)
    f_smem = np.asarray(M.film_super_mega(key, ref, force_blocked=False, **kw))
    f_blk = np.asarray(M.film_super_mega(key, ref, force_blocked=True, **kw))
    d = np.abs(f_smem - f_blk)
    print(f"ref-scene blocked vs smem: max|diff| {d.max():.2e}, "
          f"pixels>1e-4 {int((d.max(axis=-1) > 1e-4).sum())}/{512 * 512}",
          flush=True)

    # 2+3. 20k torus
    scn = big_scene()
    for size, spp in ((256, 4), (512, 4), (512, 16)):
        fn = jax.jit(lambda k, s=size, p=spp: M.film_super_mega(
            k, scn, s, s, p))
        best, film = bench(fn, key, tag=f"take-list {size}^2 x {spp}")
        paths = size * size * spp
        print(f"  -> {paths / best / 1e6:.2f} Mpaths/s", flush=True)

    # XLA pipeline comparison at 512^2 x 4
    import os
    os.environ["PT_NO_MEGAKERNEL"] = "1"
    from opencl_montecarlo_path_tracing_tpu.models.super import film_super
    from opencl_montecarlo_path_tracing_tpu.core.quirks import DEFAULT
    fn_x = jax.jit(lambda k: film_super(k, scn, 512, 512, 4, 0, 4, DEFAULT))
    try:
        best, f_xla = bench(fn_x, key, repeats=1, tag="xla pipeline 512^2 x 4")
        fn_b = jax.jit(lambda k: M.film_super_mega(k, scn, 512, 512, 4))
        f_b = np.asarray(fn_b(key))
        d = np.abs(f_xla - f_b)
        print(f"20k blocked vs XLA: max|diff| {d.max():.2e}, "
              f"pixels>1e-3 {int((d.max(axis=-1) > 1e-3).sum())}/{512 * 512}",
              flush=True)
    except Exception as e:
        print(f"xla comparison failed: {e}", flush=True)


if __name__ == "__main__":
    main()
