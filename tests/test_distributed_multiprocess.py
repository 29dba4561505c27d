"""Two-process jax.distributed equivalence (round-1 verdict item #6).

Spawns two REAL processes (coordinator on localhost, 4 forced CPU devices
each -> one global 8-device mesh, collectives over Gloo) running 3
shared-seed train steps on the synthetic COCO fixture via
tests/distributed_worker.py, plus the same program single-process with 8
local devices. Both processes' final params must match each other exactly
and the single-process run numerically — making the multi-host story
(parallel/distributed.py + per-process loader shards) real instead of a
single-process no-op.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(TESTS)
WORKER = os.path.join(TESTS, "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # scrub the TPU-tunnel plugin
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(ROOT, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    return env


def _run_worker(coord, nproc, pid, data_root, out, n_local):
    return subprocess.Popen(
        [sys.executable, WORKER, coord, str(nproc), str(pid),
         data_root, out],
        env=_env(n_local), cwd=TESTS,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    from data_fixtures import make_coco_dataset

    data_root = str(tmp_path / "coco")
    make_coco_dataset(data_root, split="train", num_images=8, img_size=96)

    coord = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [_run_worker(coord, 2, i, data_root, outs[i], 4)
             for i in range(2)]
    logs = [p.communicate(timeout=2700)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    single_out = str(tmp_path / "single.npz")
    p = _run_worker("-", 1, 0, data_root, single_out, 8)
    log = p.communicate(timeout=2700)[0]
    assert p.returncode == 0, log[-3000:]

    r0, r1, rs = (np.load(o) for o in outs + [single_out])
    assert list(r0["names"]) == list(r1["names"]) == list(rs["names"])
    # the two distributed processes observe the SAME global arrays
    np.testing.assert_array_equal(r0["sums"], r1["sums"])
    np.testing.assert_array_equal(r0["heads"], r1["heads"])
    # distributed == single-process (Gloo vs local all-reduce ordering may
    # differ in the last float bits)
    np.testing.assert_allclose(r0["loss"], rs["loss"], rtol=1e-5)
    denom = np.maximum(np.abs(rs["absums"]), 1.0)
    np.testing.assert_allclose(r0["sums"] / denom, rs["sums"] / denom,
                               atol=1e-6)
    np.testing.assert_allclose(r0["heads"], rs["heads"], atol=1e-5)
