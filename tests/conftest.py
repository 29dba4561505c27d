"""Test harness: force JAX onto a virtual 8-device CPU platform.

This is the TPU-native substitute for multi-device testing without a cluster
(see SURVEY.md §4): sharding/pjit tests run against
``--xla_force_host_platform_device_count=8``.

The environment's axon sitecustomize registers the TPU-tunnel PJRT plugin at
interpreter startup (before conftest) and pins the backend, so setting
JAX_PLATFORMS here is too late — we re-exec pytest once with the plugin's
trigger env var cleared to get a genuine multi-device CPU platform.
"""

import os
import sys

# XLA CPU aborts the whole process if a collective participant doesn't
# reach the rendezvous within ~30s; on this 1-core host an 8-way SPMD train
# step can legitimately take minutes, so raise the termination timeout.
_MESH_FLAGS = (
    " --xla_force_host_platform_device_count=8"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1800")

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    import subprocess
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + _MESH_FLAGS).strip()
    raise SystemExit(subprocess.run(
        [sys.executable, "-m", "pytest"] + sys.argv[1:], env=env).returncode)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + _MESH_FLAGS).strip()

# Persistent XLA compilation cache: the suite is dominated by cold compiles
# of the big SPMD train-step programs (~40 of the suite's ~49 single-core
# minutes); cached re-runs drop to a few minutes. The cache key includes
# the program and compiler version, so stale hits are not a concern.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration tests (subprocesses, "
        "multi-minute compiles); deselect with -m 'not slow'")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
