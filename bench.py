"""Headline benchmark: CLSuperPathTracer workload on one TPU chip.

Renders the reference's full scene and reports camera-path throughput
(Mpaths/s/chip).  North star (BASELINE.json): >= 100 Mpaths/s/chip at
1024^2 on the super variant; vs_baseline is the ratio against that target.

Default mode prints exactly ONE JSON line (the headline super config).
BENCH_VARIANT selects another variant; BENCH_VARIANT=all runs every
variant at its standard config (docs/BENCHMARKS.md rows) and prints one
JSON line per variant, each with its regression floor ("floor",
"vs_floor") so a perf regression in any integrator is machine-detectable.

Env knobs: BENCH_SIZE (default 1024, or the variant's standard size in
all-mode), BENCH_SPP (default 1024 for super - the north-star config),
BENCH_REPEATS (default 3), BENCH_VARIANT (default "super").
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Regression floors (Mpaths/s/chip) at each variant's standard config below:
# round-1 measured numbers (docs/BENCHMARKS.md) with ~25% headroom, raised
# as kernels improve.  bench-mode "all" emits vs_floor per variant; a value
# < 1.0 is a regression.
FLOORS = {
    "super": 180.0,          # north star 100; measured 238-290 r2 (megakernel,
                             # fused occlusion + spp groups; tunnel contention swings
                             # single runs ~25% - the floor guards the 135 XLA cliff)
    "simple": 100.0,         # measured 141-172 r2 (megakernel + spp groups)
    "nodof": 50.0,           # measured 70-124 r2 (megakernel route)
    "bidirectional": 130.0,  # measured 149-177 r2 (megakernel + compaction)
    "metropolis": 90.0,      # measured 128 r2 (megakernel + live compaction)
    "metropolis_vlpgrid": 85.0,  # measured 122 r2 (masked scan + compaction)
    "trianglegrid": 10.0,    # measured 17.9 r2 (megakernel route; the
                             # forced-DDA path is 0.2, accel="dda")
}

# standard (size, spp) per variant in all-mode - the docs/BENCHMARKS.md rows
STD_CONFIG = {
    "super": (1024, 1024),
    "simple": (1024, 256),
    "nodof": (512, 64),
    "bidirectional": (512, 256),
    "metropolis": (512, 256),
    "metropolis_vlpgrid": (512, 256),
    "trianglegrid": (256, 16),
}


def make_render(variant: str, scene, size: int, spp: int):
    """Returns render(key) -> film/image for one variant at (size, spp)."""
    if variant == "super":
        from opencl_montecarlo_path_tracing_tpu.models.super import render_super
        return lambda k: render_super(k, scene, size, size, spp=spp)
    if variant == "simple":
        from opencl_montecarlo_path_tracing_tpu.models.simple import render_simple
        return lambda k: render_simple(k, size, size, spp=spp)
    if variant == "nodof":
        from opencl_montecarlo_path_tracing_tpu.models.sample_parallel import (
            render_sample_parallel)
        sg = max(2, int(round(spp ** 0.5)))
        return lambda k: render_sample_parallel(k, scene, size, size,
                                                sample_grid=sg)
    if variant == "trianglegrid":
        from opencl_montecarlo_path_tracing_tpu.models.trianglegrid import (
            render_trianglegrid)
        return lambda k: render_trianglegrid(k, scene, size, size, spp=spp)
    if variant == "bidirectional":
        from opencl_montecarlo_path_tracing_tpu.models.bidirectional import (
            render_bidirectional)
        return lambda k: render_bidirectional(k, scene, size, size, spp=spp)
    if variant in ("metropolis", "metropolis_vlpgrid"):
        from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
            render_metropolis)
        grid = variant.endswith("vlpgrid")
        return lambda k: render_metropolis(k, scene, size, size, spp=spp,
                                           use_grid=grid)
    raise SystemExit(f"unknown BENCH_VARIANT {variant}")


def spp_of(variant: str, spp: int) -> int:
    """Effective paths-per-pixel (nodof's sample grid is spp rounded to a
    square)."""
    if variant == "nodof":
        sg = max(2, int(round(spp ** 0.5)))
        return sg * sg
    return spp


def bench_one(variant: str, scene, tag: str, size: int, spp: int,
              repeats: int) -> dict:
    from opencl_montecarlo_path_tracing_tpu.core.rng import make_key

    render = make_render(variant, scene, size, spp)
    # compile + warm up (same static config as the timed runs)
    np.asarray(render(make_key(0)))

    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(render(make_key(1 + i)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    paths = size * size * spp_of(variant, spp)
    mpaths = paths / best / 1e6

    # ratios derive from the ROUNDED value so the emitted record is
    # self-consistent (vs_floor == value / floor up to 4-decimal rounding)
    value = round(mpaths, 2)
    out = {
        "metric": f"{variant}_pathtracer_throughput",
        "value": value,
        "unit": "Mpaths/s/chip",
        "vs_baseline": round(value / 100.0, 4),
        "config": f"{size}x{size} spp={spp_of(variant, spp)} scene={tag}",
        "film_mean": round(float(np.asarray(film, np.float64).mean()), 4),
    }
    floor = FLOORS.get(variant)
    if floor:
        out["floor"] = floor
        out["vs_floor"] = round(value / floor, 4)
    return out


def main():
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    variant = os.environ.get("BENCH_VARIANT", "super")

    from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene
    scene, tag = demo_scene()

    if variant == "all":
        for v, (std_size, std_spp) in STD_CONFIG.items():
            size = int(os.environ.get("BENCH_SIZE", str(std_size)))
            spp = int(os.environ.get("BENCH_SPP", str(std_spp)))
            print(json.dumps(bench_one(v, scene, tag, size, spp, repeats)),
                  flush=True)
        return

    size = int(os.environ.get("BENCH_SIZE", "1024"))
    spp = int(os.environ.get("BENCH_SPP", "1024"))  # north-star config
    print(json.dumps(bench_one(variant, scene, tag, size, spp, repeats)))


if __name__ == "__main__":
    sys.exit(main())
