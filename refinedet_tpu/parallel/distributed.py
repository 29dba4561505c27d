"""Multi-host (multi-process) runtime initialization.

The reference's only distribution mechanism is single-process
``nn.DataParallel`` (``/root/reference/train_refinedet.py:138-139``); it has
no multi-node story at all (SURVEY.md §2.3). The TPU-native equivalent is
the JAX distributed runtime: every host runs the same program, calls
``jax.distributed.initialize`` once, and then builds meshes over the
*global* device set — gradient all-reduce rides ICI inside a slice and DCN
across slices, inserted by XLA from the sharding annotations (no
hand-written communication layer).

Usage (same script on every host):

    from refinedet_tpu.parallel import distributed
    distributed.maybe_initialize()           # no-op single-host
    trainer = Trainer(..., num_devices=None) # mesh over jax.devices()
    loader = DataLoader(..., shard_id=distributed.process_index(),
                        num_shards=distributed.process_count())

On Cloud TPU pods the coordinator address / process ids come from the TPU
environment and ``jax.distributed.initialize()`` needs no arguments;
elsewhere set the standard JAX env vars or pass them explicitly.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when running multi-process.

    Returns True if initialization happened (or was already done), False
    for the plain single-process case. Explicit args win; otherwise the
    standard env vars (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``) or the TPU-pod auto-detection are used. Safe to
    call twice (second call is a no-op).
    """
    import jax

    explicit = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    on_pod_env = any(os.environ.get(k) for k in
                     ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if not explicit and not on_pod_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return True
        raise
    except ValueError as e:
        # TPU-ish env vars present but no resolvable coordinator (e.g. a
        # single tunneled chip): stay single-process rather than crash.
        if "coordinator_address" in str(e):
            return False
        raise
    return True


def process_index() -> int:
    """This host's id (== loader shard_id for disjoint data shards)."""
    import jax
    return jax.process_index()


def process_count() -> int:
    """Number of participating hosts (== loader num_shards)."""
    import jax
    return jax.process_count()
