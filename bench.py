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
    variant = os.environ.get("BENCH_VARIANT", "super")

    from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene

    scene, tag = demo_scene()

    if variant == "super":
        from opencl_montecarlo_path_tracing_tpu.models.super import render_super
        render = lambda k: render_super(k, scene, size, size, spp=spp)
    elif variant == "simple":
        from opencl_montecarlo_path_tracing_tpu.models.simple import render_simple
        render = lambda k: render_simple(k, size, size, spp=spp)
    elif variant == "trianglegrid":
        from opencl_montecarlo_path_tracing_tpu.models.trianglegrid import (
            render_trianglegrid)
        render = lambda k: render_trianglegrid(k, scene, size, size, spp=spp)
    elif variant == "bidirectional":
        from opencl_montecarlo_path_tracing_tpu.models.bidirectional import (
            render_bidirectional)
        render = lambda k: render_bidirectional(k, scene, size, size, spp=spp)
    elif variant == "metropolis":
        from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
            render_metropolis)
        render = lambda k: render_metropolis(k, scene, size, size, spp=spp)
    else:
        raise SystemExit(f"unknown BENCH_VARIANT {variant}")

    # compile + warm up (same static config as the timed runs)
    np.asarray(render(make_key(0)))

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(render(make_key(1 + i)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    paths = size * size * spp
    mpaths = paths / best / 1e6

    print(json.dumps({
        "metric": f"{variant}_pathtracer_throughput",
        "value": round(mpaths, 2),
        "unit": "Mpaths/s/chip",
        "vs_baseline": round(mpaths / 100.0, 4),
        "config": f"{size}x{size} spp={spp} scene={tag}",
        "film_mean": round(float(film.mean()), 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
