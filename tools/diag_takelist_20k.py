"""Take-list blocked scan: 20k-torus throughput + XLA equality on chip."""

from __future__ import annotations

import time

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tools.diag_blocked import big_scene
from tools.diag_takelist_chip import bench


def amortized(scn, size, spp, frames=8):
    """Render ``frames`` frames inside ONE jit (different keys) so the
    ~25-50 ms per-call tunnel overhead amortizes - the kernel-throughput
    number (CLAUDE.md: amortize per-call transfer overhead with an in-jit
    loop when measuring sub-100 ms kernels)."""
    import jax.numpy as jnp

    def many(key):
        def body(i, acc):
            k = (key[0] + i.astype(jnp.uint32), key[1])
            return acc + M.film_super_mega(k, scn, size, size, spp)
        return jax.lax.fori_loop(0, frames, body,
                                 jnp.zeros((size, size, 3), jnp.float32))
    return jax.jit(many), frames


def main():
    key = make_key(7)
    scn = big_scene()
    print("scene built", flush=True)
    for size, spp in ((256, 4), (512, 4), (512, 16)):
        fn = jax.jit(lambda k, s=size, p=spp: M.film_super_mega(
            k, scn, s, s, p))
        best, film = bench(fn, key, tag=f"take-list {size}^2 x {spp}")
        paths = size * size * spp
        print(f"  -> {paths / best / 1e6:.2f} Mpaths/s", flush=True)
    for size, spp in ((256, 4), (512, 4)):
        fn, frames = amortized(scn, size, spp)
        best, film = bench(fn, key, tag=f"amortized x{frames} {size}^2 x {spp}")
        paths = size * size * spp * frames
        print(f"  -> {paths / best / 1e6:.2f} Mpaths/s (in-jit)", flush=True)

    import os
    os.environ["PT_NO_MEGAKERNEL"] = "1"
    from opencl_montecarlo_path_tracing_tpu.models.super import film_super
    from opencl_montecarlo_path_tracing_tpu.core.quirks import DEFAULT
    fn_x = jax.jit(lambda k: film_super(k, scn, 512, 512, 4, 0, 4, DEFAULT))
    best, f_xla = bench(fn_x, key, repeats=1, tag="xla pipeline 512^2 x 4")
    del os.environ["PT_NO_MEGAKERNEL"]
    fn_b = jax.jit(lambda k: M.film_super_mega(k, scn, 512, 512, 4))
    f_b = np.asarray(fn_b(key))
    d = np.abs(f_xla - f_b)
    print(f"20k blocked vs XLA: max|diff| {d.max():.2e}, "
          f"pixels>1e-3 {int((d.max(axis=-1) > 1e-3).sum())}/{512 * 512}",
          flush=True)


if __name__ == "__main__":
    main()
