"""bench.py driver-artifact plumbing (round-2 item #2, probe-first per
round-3 verdict item #1).

BENCH_r02 was red because one tunnel hiccup produced a bare traceback;
BENCH_r03 was red because the single 600 s measurement wait sampled a
dead tunnel exactly once. These tests pin the probe-first harness WITHOUT
a backend (BENCH_SELFTEST hooks):

* success: probe passes, measurement JSON re-emitted with rc 0 and
  persisted as the last-good record;
* fail-fast measurement error: re-probed + retried up to MAX_ATTEMPTS,
  then a parseable error JSON with rc 1;
* hung measurement (after a good probe): killed at the attempt timeout,
  then re-probed + re-measured while attempts/budget remain (round-4
  verdict item #2: the tunnel flaps on minute timescales, so a
  probe-ok→measure-hang sequence is a transient); a hang_once scenario
  pins the full hang→re-probe→success recovery, and the failure JSON
  carries the measurement child's stderr tail so a hung artifact shows
  where it died;
* hung/failing probe: retried with backoff until ~80% of the budget,
  never launching the expensive measurement, and the error JSON carries
  the probe count plus the most recent last-good measurement.
"""

import json
import os
import os.path as osp
import subprocess
import sys
import time

BENCH = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "bench.py")


def _run(selftest, **env_overrides):
    env = dict(os.environ)
    env["BENCH_SELFTEST"] = selftest
    env.setdefault("BENCH_TOTAL_BUDGET_S", "10")
    env.setdefault("BENCH_PROBE_TIMEOUT_S", "5")
    env.setdefault("BENCH_PROBE_BACKOFF_S", "0.1")
    env.setdefault("BENCH_ATTEMPT_TIMEOUT_S", "5")
    for k, v in env_overrides.items():
        env[k] = v
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True, timeout=120)
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert lines, proc.stderr
    return proc.returncode, json.loads(lines[-1])


def test_bench_success_reemits_child_json_and_persists(tmp_path):
    lg = str(tmp_path / "last_good.json")
    rc, out = _run("ok", BENCH_LAST_GOOD=lg)
    assert rc == 0
    assert out["metric"] == "refinedet320_inference_throughput"
    assert out["value"] == 1234.5
    assert out["vs_baseline"] == 10.0
    with open(lg) as f:
        rec = json.load(f)
    assert rec["value"] == 1234.5 and rec["measured_at_unix"] > 0


def test_bench_failure_retries_then_structured_error(tmp_path):
    rc, out = _run("fail", BENCH_LAST_GOOD=str(tmp_path / "lg.json"))
    assert rc == 1
    assert out["value"] is None
    assert "error" in out and out["error"]
    # fail-fast measurement errors loop back through probing up to the
    # measurement-attempt cap
    assert out["measure_attempts"] == 3
    assert out["probe_attempts"] >= 3
    assert "last_good" not in out  # nothing ever succeeded here


def test_bench_hung_measurement_retried_to_cap_with_stderr_tail(tmp_path):
    rc, out = _run("hang", BENCH_ATTEMPT_TIMEOUT_S="2",
                   BENCH_TOTAL_BUDGET_S="60",
                   BENCH_MEASURE_FLOOR_S="1",
                   BENCH_LAST_GOOD=str(tmp_path / "lg.json"))
    assert rc == 1
    assert out["value"] is None
    assert "hung" in out["error"]
    # a hang after a good probe is treated as a tunnel flap: re-probe and
    # re-measure up to the attempt cap (round-4 verdict item #2)
    assert out["measure_attempts"] == 3
    assert out["probe_attempts"] >= 3
    # the child's stderr progress tail is embedded so a hung round
    # artifact shows where it died
    assert "synthetic hang" in out.get("measure_stderr_tail", "")


def test_bench_hang_once_recovers_via_reprobe(tmp_path):
    # First measurement hangs, the harness re-probes, second succeeds.
    rc, out = _run("hang_once", BENCH_ATTEMPT_TIMEOUT_S="2",
                   BENCH_TOTAL_BUDGET_S="60",
                   BENCH_MEASURE_FLOOR_S="1",
                   BENCH_SELFTEST_STATE=str(tmp_path / "hang_once.marker"),
                   BENCH_LAST_GOOD=str(tmp_path / "lg.json"))
    assert rc == 0
    assert out["value"] == 1234.5
    with open(str(tmp_path / "lg.json")) as f:
        assert json.load(f)["value"] == 1234.5


def test_bench_hung_measurement_not_retried_when_budget_spent(tmp_path):
    # With the measure floor consuming the whole leftover budget, a hang
    # must NOT spiral into more attempts.
    t0 = time.time()
    rc, out = _run("hang", BENCH_ATTEMPT_TIMEOUT_S="2",
                   BENCH_TOTAL_BUDGET_S="4",
                   BENCH_MEASURE_FLOOR_S="3",
                   BENCH_LAST_GOOD=str(tmp_path / "lg.json"))
    dt = time.time() - t0
    assert rc == 1
    assert out["measure_attempts"] == 1
    assert dt < 8, dt


def test_bench_dead_tunnel_probes_across_budget_carries_last_good(tmp_path):
    lg = str(tmp_path / "last_good.json")
    # Seed a last-good record the way a prior healthy round would have.
    rc, _ = _run("ok", BENCH_LAST_GOOD=lg)
    assert rc == 0
    # Now the tunnel "dies": every probe hangs. The harness must sample
    # it several times, never start the 600s-class measurement, and ship
    # the seeded last-good number inside the structured error.
    rc, out = _run("probe_hang", BENCH_PROBE_TIMEOUT_S="1",
                   BENCH_TOTAL_BUDGET_S="6", BENCH_LAST_GOOD=lg)
    assert rc == 1
    assert out["value"] is None
    assert "probe" in out["error"]
    assert out["probe_attempts"] >= 2
    assert out["measure_attempts"] == 0
    assert out["last_good"]["value"] == 1234.5


def test_bench_probe_failfast_retried(tmp_path):
    rc, out = _run("probe_fail", BENCH_TOTAL_BUDGET_S="6",
                   BENCH_LAST_GOOD=str(tmp_path / "lg.json"))
    assert rc == 1
    assert out["probe_attempts"] >= 2
    assert out["measure_attempts"] == 0
    assert "probe rc=" in out["error"]
