"""bench.py contract: variant registry, regression floors, driver format."""

import glob
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402

from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene  # noqa: E402
from opencl_montecarlo_path_tracing_tpu.core.rng import make_key  # noqa: E402


def test_every_variant_has_floor_and_config():
    assert set(bench.FLOORS) == set(bench.STD_CONFIG)
    for v, f in bench.FLOORS.items():
        assert f > 0, v
    for v, (size, spp) in bench.STD_CONFIG.items():
        assert size >= 64 and spp >= 1, v


def test_make_render_builds_every_variant():
    scene, _ = demo_scene()
    for v in bench.STD_CONFIG:
        fn = bench.make_render(v, scene, 64, 4)
        assert callable(fn), v


def test_bench_one_json_contract():
    """One tiny real measurement (CPU): the emitted record must carry the
    driver-required fields and the floor ratio."""
    scene, tag = demo_scene()
    rec = bench.bench_one("super", scene, tag, 32, 2, repeats=1)
    for field in ("metric", "value", "unit", "vs_baseline", "floor",
                  "vs_floor"):
        assert field in rec, field
    assert rec["unit"] == "Mpaths/s/chip"
    assert rec["value"] > 0
    assert np.isclose(rec["vs_floor"], rec["value"] / bench.FLOORS["super"],
                      rtol=1e-3)


def test_recorded_bench_results_meet_floors():
    """Every driver-recorded BENCH_r*.json must sit above its variant's
    regression floor - the machine check VERDICT round 1 asked for."""
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        with open(path) as fp:
            data = json.load(fp)
        parsed = data.get("parsed")
        if not parsed:
            continue
        variant = parsed["metric"].replace("_pathtracer_throughput", "")
        floor = bench.FLOORS.get(variant)
        if floor is None:
            continue
        assert parsed["value"] >= floor, (
            f"{path}: {variant} {parsed['value']} < floor {floor}")
