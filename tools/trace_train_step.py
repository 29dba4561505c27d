"""Capture a REAL jax.profiler timeline of the full train step on the TPU
(round-2 verdict stretch item #8) and summarize it from the xplane proto.

The earlier attribution evidence (tools/profile_train_step.py — surgical
program reduction; tools/flops_train_step.py — XLA cost analysis) is
indirect: it cannot see dispatch gaps between steps or how device time
splits across op categories inside ONE real execution. This tool runs the
actual jitted train step (train/train_step.py, same config as the README
train rows: 320 input, bf16 compute, nc=2) N times dispatched
back-to-back (chained through the donated TrainState, host blocking only
at the end — the Trainer's pipelined dispatch pattern), under
``jax.profiler.trace``, then parses the ``*.xplane.pb`` directly
(tensorflow.tsl xplane proto; no tensorboard UI needed):

  * per-step device time from the "XLA Modules" line,
  * device idle between consecutive module executions = dispatch gap,
  * top ops and an op-category split (convolution / fusion / copy / ...)
    from the "XLA Ops" line.

Usage: python tools/trace_train_step.py [batch] [steps]
Writes the summary to stdout and tools/TRACE_NOTES.md.
"""

import os.path as _osp
import sys
import tempfile

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tools"))

import numpy as np

from xplane_summary import summarize  # noqa: E402 (sets protobuf impl)

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
BATCH = int(_pos[0]) if _pos and sys.argv[1] != "--summarize" else 128
STEPS = int(_pos[1]) if len(_pos) > 1 and sys.argv[1] != "--summarize" else 3


def capture(logdir: str):
    import jax
    import jax.numpy as jnp

    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.train import (create_train_state, make_optimizer,
                                     make_train_step)

    print("devices:", jax.devices(), flush=True)
    model = build_refinedet("train", 320, 2, dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=BATCH, max_boxes=8)
    tx = make_optimizer(lambda s: 1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, tx, cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-120, 130, (BATCH, 320, 320, 3))
                         .astype(np.float32))
    boxes = jnp.asarray(np.tile(np.array([0.2, 0.2, 0.6, 0.6], np.float32),
                                (BATCH, cfg.max_boxes, 1)))
    labels = jnp.ones((BATCH, cfg.max_boxes), jnp.int32)
    valid = jnp.asarray(np.arange(cfg.max_boxes)[None]
                        < np.full((BATCH, 1), 2))

    # compile + settle (first executions can absorb one-time relay costs)
    for _ in range(3):
        state, metrics = step(state, images, boxes, labels, valid)
    jax.block_until_ready(metrics["loss"])

    with jax.profiler.trace(logdir):
        for _ in range(STEPS):  # back-to-back dispatch, block only at end
            state, metrics = step(state, images, boxes, labels, valid)
        jax.block_until_ready(metrics["loss"])


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize":
        print(summarize(sys.argv[2], BATCH))  # re-analyze an existing dir
        return
    logdir = tempfile.mkdtemp(prefix="trace_train_")
    capture(logdir)
    summary = summarize(logdir, BATCH)
    header = (f"# jax.profiler trace: RefineDet320 train step, batch "
              f"{BATCH}, {STEPS} steps back-to-back (axon TPU v5e)\n\n"
              "Captured by tools/trace_train_step.py; raw xplane under "
              f"{logdir} (not committed).\n\n```\n")
    print(summary, flush=True)
    with open(_osp.join(_repo, "tools", "TRACE_NOTES.md"), "w") as f:
        f.write(header + summary + "\n```\n")
    print(f"\nwrote tools/TRACE_NOTES.md (trace dir: {logdir})")


if __name__ == "__main__":
    main()
