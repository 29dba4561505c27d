"""bench.py driver-artifact plumbing (round-2 verdict item #2).

BENCH_r02 was red because one tunnel hiccup produced a bare traceback the
driver couldn't parse. These tests pin the hardened harness WITHOUT a
backend (BENCH_SELFTEST hooks): success re-emits the child's JSON with
rc 0; persistent failure retries MAX_ATTEMPTS times then emits a
parseable error JSON with rc 1; a hung child is killed at the attempt
timeout and NOT retried (a dead-hang tunnel must not eat the driver
budget), also yielding parseable error JSON.
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
    env.setdefault("BENCH_RETRY_BACKOFF_S", "0.1")
    env.setdefault("BENCH_ATTEMPT_TIMEOUT_S", "5")
    for k, v in env_overrides.items():
        env[k] = v
    proc = subprocess.run([sys.executable, BENCH], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True, timeout=120)
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert lines, proc.stderr
    return proc.returncode, json.loads(lines[-1])


def test_bench_success_reemits_child_json():
    rc, out = _run("ok")
    assert rc == 0
    assert out["metric"] == "refinedet320_inference_throughput"
    assert out["value"] == 1234.5
    assert out["vs_baseline"] == 10.0


def test_bench_failure_retries_then_structured_error():
    t0 = time.time()
    rc, out = _run("fail", BENCH_RETRY_BACKOFF_S="0.2")
    assert rc == 1
    assert out["value"] is None
    assert "error" in out and out["error"]
    # three attempts -> two backoff sleeps actually happened
    assert time.time() - t0 >= 0.4


def test_bench_hung_child_killed_not_retried():
    t0 = time.time()
    rc, out = _run("hang", BENCH_ATTEMPT_TIMEOUT_S="2")
    dt = time.time() - t0
    assert rc == 1
    assert out["value"] is None
    assert "hung" in out["error"]
    # one timeout (~2s), no second attempt (~4s+)
    assert dt < 3.8, dt
