"""The driver runs bench.py on the real chip at the end of every round; a
harness bug there silently loses the round's measurement. This test drives
the FULL parent path — watchdog, retry ladder, child subprocess, JSON
contract — on CPU with tiny geometry (FQ3T_BENCH_TINY)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_end_to_end():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the child on CPU
    env["JAX_PLATFORMS"] = "cpu"
    env["FQ3T_BENCH_TINY"] = "1"
    env["FQ3T_TTH_BUCKET"] = "32"
    env["FQ3T_SCAN_UNROLL"] = "1"
    env["FQ3T_PRED_UNROLL"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--smoke", "--runs", "1", "--frames", "16", "--stall-secs", "240"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # contract: exactly ONE JSON line on stdout with the required fields
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    result = json.loads(lines[0])
    for field in ("metric", "value", "unit", "vs_baseline"):
        assert field in result, result
    assert result["value"] > 0
    ex = result["extras"]
    assert ex["p50_ttfa_ms"] > 0 and ex["non_streaming_rtf"] > 0
    assert ex["mode"] == "xvec_only"
