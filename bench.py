"""Headline benchmark: CLSuperPathTracer workload on one TPU chip.

Renders the reference's full scene at 1024^2 and reports camera-path
throughput (Mpaths/s/chip).  North star (BASELINE.json): >= 100 Mpaths/s/chip
at 1024^2; vs_baseline is the ratio against that target.

Prints exactly one JSON line.

Env knobs: BENCH_SIZE (default 1024), BENCH_SPP (default 64),
BENCH_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "1024"))  # north-star config
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
    from opencl_montecarlo_path_tracing_tpu.models.super import render_super
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene

    scene, tag = demo_scene()

    # compile + warm up (same static config as the timed runs)
    np.asarray(render_super(make_key(0), scene, size, size, spp=spp))

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(render_super(make_key(1 + i), scene, size, size,
                                       spp=spp))
        times.append(time.perf_counter() - t0)
    best = min(times)
    paths = size * size * spp
    mpaths = paths / best / 1e6

    print(json.dumps({
        "metric": "super_pathtracer_throughput",
        "value": round(mpaths, 2),
        "unit": "Mpaths/s/chip",
        "vs_baseline": round(mpaths / 100.0, 4),
        "config": f"{size}x{size} spp={spp} scene={tag}",
        "film_mean": round(float(film.mean()), 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
