"""Where does the stream-tier compile time go? (262k never finished a
30-min compile through the tunnel.)

Times jit .lower() (local trace+lowering) separately from .compile()
(XLA+Mosaic, remote through the tunnel) at growing mesh sizes, so the
pathology is attributable: a slow lower() is our Python/unroll problem,
a slow compile() is a Mosaic scaling problem.

Env: PT_DIAG_MESHES="256,128;512,256" (major,minor pairs; ; separated)
     PT_DIAG_SIZE=512  PT_DIAG_STAGE=lower|compile|run
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    demo_scene, torus_mesh)
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene

SIZE = int(os.environ.get("PT_DIAG_SIZE", "512"))
SPP = 4


def main():
    key = make_key(9)
    meshes = os.environ.get("PT_DIAG_MESHES", "256,128;512,256")
    stage = os.environ.get("PT_DIAG_STAGE", "run")
    for pair in meshes.split(";"):
        nm = tuple(int(x) for x in pair.split(","))
        base, _ = demo_scene()
        t0 = time.perf_counter()
        scn = prep_scene(Scene(
            sphere_centers=base.sphere_centers, square_kj=base.square_kj,
            triangles=torus_mesh(n_major=nm[0], n_minor=nm[1]),
            lights=base.lights))
        t_prep = time.perf_counter() - t0
        nt = int(scn.tri_v0.shape[0])
        fn = jax.jit(lambda k, s=scn: M.film_super_mega(
            k, s, SIZE, SIZE, SPP, force_stream=True))
        t0 = time.perf_counter()
        lowered = fn.lower(key)
        t_lower = time.perf_counter() - t0
        print(f"nt={nt:7d}: prep {t_prep:6.1f}s  lower {t_lower:6.1f}s",
              flush=True)
        if stage == "lower":
            continue
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_comp = time.perf_counter() - t0
        print(f"nt={nt:7d}: compile {t_comp:6.1f}s", flush=True)
        if stage == "compile":
            continue
        t0 = time.perf_counter()
        film = np.asarray(compiled(key))
        t_run = time.perf_counter() - t0
        paths = SIZE * SIZE * SPP
        print(f"nt={nt:7d}: run1 {t_run:6.1f}s ({paths / t_run / 1e6:6.2f} "
              f"Mpaths/s) mean {film.mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
