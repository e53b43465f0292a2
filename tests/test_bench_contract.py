"""Contract test for the ONE JSON line bench.py prints.

The round-3 artifact (BENCH_r03.json) was unparseable because the line grew
past the driver's tail capture once per-trial probe arrays were added. This
pins the contract: the printed line parses, stays under the capture budget,
and still carries every headline field — bulk detail goes to
BENCH/bench_detail.json instead.
"""

import json

import bench


def _fat_output() -> dict:
    """An output dict shaped like a real run, padded with the per-trial
    arrays that blew up the r3 line."""
    trial = {k: 1234.5678 for k in (
        "kern_small", "cpu_small", "membw_small", "kern_big", "cpu_big",
        "membw_big", "kern_eff", "cpu_eff", "membw_eff", "engine_vs_cpu",
        "engine_vs_membw")}
    probes = {
        "probe_cpus_small": 2, "probe_cpus_big": 8, "quiet_trials": 3,
        "quiet_kernel_efficiency": 0.91, "kernel_small_mb_s": 330.1,
        "kernel_big_mb_s": 1240.7, "kernel_efficiency": 0.94,
        "cpu_control_efficiency": 0.9, "membw_control_efficiency": 0.8,
        "engine_efficiency_vs_cpu_control": 1.0,
        "engine_efficiency_vs_membw_control": 1.0,
        "probe_trials": [dict(trial) for _ in range(40)],  # the r3 killer
        "probe_design": "x" * 400,
    }
    return {
        "metric": "fsst_spark encode+pipeline wall time",
        "value": 20.5, "unit": "sec",
        "queries": {f"q{i}": 1.25 for i in range(12)},
        "sf": 0.1, "encode_mb_s": 400.2, "ratio": 2.133,
        "scaling": {
            "n1_mb_s": 14.0, "n4_mb_s": 54.1, "efficiency_1_to_4": 0.96,
            "walls_1_sec": [9.9] * 8, "walls_4_sec": [2.5] * 16,
            "cpus_small": 8, "cpus_big": 32,
            "throughput_small_mb_s": 120.0, "throughput_big_mb_s": 402.0,
            "walls_small_sec": [4.1] * 8, "walls_big_sec": [3.2] * 8,
            "efficiency": 0.83,
            **probes,
            "probe_saturated": dict(probes),
        },
    }


def test_compact_line_parses_and_fits():
    line = json.dumps(bench.compact_output(_fat_output()))
    # the driver captures the LAST 2,000 bytes of stdout; an over-budget
    # line comes back head-truncated mid-JSON and records "parsed": null
    # (the r3 AND r4 artifacts both failed exactly this way)
    assert bench.MAX_LINE_BYTES <= 1900
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    # headline fields survive compaction
    assert parsed["value"] == 20.5
    assert parsed["encode_mb_s"] == 400.2
    assert parsed["ratio"] == 2.133
    assert len(parsed["queries"]) == 12
    s = parsed["scaling"]
    assert s["efficiency_1_to_4"] == 0.96
    assert s["quiet_kernel_efficiency"] == 0.91
    assert s["quiet_trials"] == 3
    assert s["kernel_efficiency"] == 0.94
    # the bulk is gone
    assert "probe_trials" not in s
    assert "probe_trials" not in s.get("probe_saturated", {})
    assert "walls_big_sec" not in s
    # the ~600-char probe prose is a pointer now (full text in bench_detail)
    assert s["probe_design"] == "see bench_detail"
    assert s["probe_saturated"]["probe_design"] == "see bench_detail"


def test_oversized_output_degrades_instead_of_dying():
    """An output dict that cannot fit even after the standard strips must
    shrink (dropping low-priority keys) rather than raise — the r4 builder
    used an assert here, which both crashes after a multi-minute run and
    vanishes under python -O."""
    out = _fat_output()
    # inflate beyond any budget with un-stripped junk at both levels
    out["scaling"]["giant_note"] = "y" * 4000
    out["giant_top"] = "z" * 4000
    compact = bench.compact_output(out)  # must not raise
    line = json.dumps(compact)
    assert len(line) <= bench.MAX_LINE_BYTES
    parsed = json.loads(line)
    # north-rule headline fields survive even the aggressive degrade
    assert parsed["value"] == 20.5
    assert parsed["queries"]
    assert parsed["scaling"]["quiet_kernel_efficiency"] == 0.91
    assert parsed["scaling"]["efficiency_1_to_4"] == 0.96


def test_compact_is_lossless_on_scalars():
    out = _fat_output()
    compact = bench.compact_output(out)
    # every non-bulky scalar key survives verbatim
    for k, v in out.items():
        if not isinstance(v, dict):
            assert compact[k] == v
