"""Capture a REAL jax.profiler timeline of the inference path (the
bench.py headline config: RefineDet320, batch 128, bf16, 21 classes,
full test-phase program — backbone + heads + softmax + ARM-objectness
filter + cascade decode, the reference's live Detect_RefineDet path,
/root/reference/layers/functions/detection_refinedet.py:27-65).

Companion to tools/trace_train_step.py (which answered where the train
step's time goes); this one decomposes the remaining ~26% of MXU
headroom in the 2002 img/s inference headline: how much is non-conv op
time (maxpool, L2Norm, decode/softmax) vs conv fusions running below
peak. Summary written to tools/TRACE_NOTES_INFER.md.

Usage: python tools/trace_infer.py [batch] [iters]
       python tools/trace_infer.py --summarize <trace_dir>
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
ITERS = int(_pos[1]) if len(_pos) > 1 and sys.argv[1] != "--summarize" else 4


def capture(logdir: str):
    import jax
    import jax.numpy as jnp

    from refinedet_tpu.models import build_refinedet

    print("devices:", jax.devices(), flush=True)
    model = build_refinedet("test", 320, 21, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    fn = jax.jit(model.apply)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-120, 130, (BATCH, 320, 320, 3)).astype(np.float32))

    # compile + settle (first executions can absorb one-time relay costs)
    for _ in range(3):
        out = fn(params, images)
    jax.block_until_ready(out)

    with jax.profiler.trace(logdir):
        for _ in range(ITERS):  # back-to-back dispatch, block only at end
            out = fn(params, images)
        jax.block_until_ready(out)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize":
        print(summarize(sys.argv[2], BATCH))
        return
    logdir = tempfile.mkdtemp(prefix="trace_infer_")
    capture(logdir)
    summary = summarize(logdir, BATCH)
    header = (f"# jax.profiler trace: RefineDet320 inference, batch "
              f"{BATCH}, {ITERS} executions back-to-back (axon TPU v5e)\n\n"
              "Captured by tools/trace_infer.py; raw xplane under "
              f"{logdir} (not committed).\n\n```\n")
    print(summary, flush=True)
    with open(_osp.join(_repo, "tools", "TRACE_NOTES_INFER.md"), "w") as f:
        f.write(header + summary + "\n```\n")
    print(f"\nwrote tools/TRACE_NOTES_INFER.md (trace dir: {logdir})")


if __name__ == "__main__":
    main()
