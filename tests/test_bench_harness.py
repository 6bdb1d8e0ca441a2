"""Driver-facing bench harness: roofline math, watchdog error contract, and
all-mode per-config subprocess isolation (bench.py is the artifact the
driver runs on the real chip — its failure modes must be machine-readable)."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_roofline_annotation_math():
    detail = {"step_ms": 100.0, "flops": 11.5e12, "bytes_accessed": 40.95e9}
    bench._roofline(detail)
    assert detail["achieved_tflops"] == 115.0          # 11.5e12 / 0.1s
    assert detail["pct_sustained_matmul"] == 100.0     # the calibration point
    np.testing.assert_allclose(detail["pct_peak"], 100 * 115 / 197, atol=0.05)
    assert detail["xla_bytes_gbps_upper"] == 409.5
    np.testing.assert_allclose(detail["pct_hbm_upper"], 50.0, atol=0.1)

    empty = {"step_ms": 0.0}
    bench._roofline(empty)  # no flops / zero time: annotation is a no-op
    assert "achieved_tflops" not in empty


def test_watchdog_emits_error_json_line():
    """A wedged backend must surface as ONE machine-readable line + exit 75
    (EX_TEMPFAIL), never a silent hang (observed tunnel-outage mode)."""
    env = dict(os.environ)
    env.update(BENCH_TIMEOUT_S="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import time, bench\nbench._arm_watchdog()\ntime.sleep(30)\n"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 75
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["metric"] == "error" and "watchdog" in line["detail"]["error"]


def test_all_mode_isolates_config_failures(tmp_path):
    """BENCH_MODE=all must produce BENCHMARKS.json with one entry per config
    even when every config subprocess dies (here: 10s watchdog on CPU) —
    a hang in one config can't lose the suite."""
    env = dict(os.environ)
    env.update(BENCH_MODE="all", BENCH_CONFIG_TIMEOUT_S="10",
               JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=300,
    )
    results = json.load(open(tmp_path / "BENCHMARKS.json"))
    assert set(results) == {"vlmo_pretrain", "vlmo_large_pretrain", "dvae",
                            "dvae_w8a8", "bert_mlm", "bert_mlm_w8a8",
                            "beit_mim", "vqa", "vqa_serving",
                            "vqa_serving_w8a8"}
    for v in results.values():  # every config recorded a structured failure
        assert v.get("metric") == "error" or "error" in v
    # the flagship line is still printed for the driver
    flagship = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert "metric" in flagship
