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

import glob
import os
import os.path as _osp
import sys
import tempfile
from collections import defaultdict

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
# The bundled tensorboard/tsl *_pb2 modules predate protobuf 5's generated
# -code check; pure-python parsing sidesteps it (slower, fine for one file).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
BATCH = int(_pos[0]) if _pos and sys.argv[1] != "--summarize" else 128
STEPS = int(_pos[1]) if len(_pos) > 1 and sys.argv[1] != "--summarize" else 3


import re


def opcode_of(name: str) -> str:
    """Extract the HLO opcode from a long-form op string.

    Names look like ``%fusion.689 = (bf16[...]{...}) fusion(f32[...]), ...``
    or ``%copy.3 = bf16[...]{...} copy(bf16[...])`` — the opcode is the
    first lowercase identifier applied to parentheses on the RHS (layout
    annotations like T(8,128) / S(1) are uppercase, so they don't match).
    """
    rhs = name.split("=", 1)[-1]
    m = re.search(r"[\s)]([a-z][a-z0-9\-_]*)\(", rhs)
    return m.group(1) if m else "?"


def categorize(name: str) -> str:
    """Bucket an op for the summary split.

    Keyed on the real opcode (an earlier version substring-matched the
    whole op string, which mis-filed optimizer/weight-grad fusions whose
    bodies mention 'copy' as layout copies). Fusions are split by their
    name prefix (multiply_add_fusion, copy_fusion, ...) since that names
    the dominant body op.
    """
    op = opcode_of(name)
    if op != "fusion":
        return op
    m = re.match(r"%?([a-z0-9_.]+?)_?fusion", name.split("=", 1)[0].strip())
    kind = m.group(1).rstrip("_.") if m and m.group(1) else ""
    return f"fusion:{kind}" if kind else "fusion"


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


def summarize(logdir: str) -> str:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    device = next(p for p in xs.planes if "/device:TPU" in p.name)
    meta = device.event_metadata
    lines = {l.name: l for l in device.lines}

    out = []
    mods = sorted(lines["XLA Modules"].events, key=lambda e: e.offset_ps)
    durs = [e.duration_ps / 1e9 for e in mods]  # ms
    gaps = [(mods[i + 1].offset_ps - (mods[i].offset_ps
                                      + mods[i].duration_ps)) / 1e9
            for i in range(len(mods) - 1)]
    span = (mods[-1].offset_ps + mods[-1].duration_ps
            - mods[0].offset_ps) / 1e9
    out.append(f"module executions: {len(mods)}")
    out.append("per-step device time (ms): "
               + ", ".join(f"{d:.2f}" for d in durs))
    out.append("dispatch gaps between steps (ms): "
               + (", ".join(f"{g:.3f}" for g in gaps) or "n/a"))
    busy = sum(durs)
    out.append(f"device busy {busy:.2f} ms / span {span:.2f} ms "
               f"-> idle {(span - busy) / span * 100:.2f}% of the traced "
               "window (back-to-back dispatch)")
    out.append(f"throughput implied by device step time: "
               f"{BATCH / (busy / len(mods)) * 1000:.0f} img/s")

    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    for ev in lines["XLA Ops"].events:
        name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
        by_op[name] += ev.duration_ps / 1e9
        by_cat[categorize(name)] += ev.duration_ps / 1e9
    tot = sum(by_cat.values())
    out.append(f"\nop-category split of {tot:.2f} ms total op time "
               f"({len(by_op)} distinct ops):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        out.append(f"  {cat:>14s}: {ms:8.2f} ms  ({ms / tot * 100:5.1f}%)")
    out.append("\ntop 15 ops by accumulated device time:")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        out.append(f"  {ms:8.2f} ms  {name[:90]}")

    # Where do the layout-change copies sit? True copy ops/copy-fusions
    # only, grouped by shape+layout signature — the lead list for any
    # layout-tuning attempt.
    copies = defaultdict(float)
    for name, ms in by_op.items():
        cat = categorize(name)
        if cat == "copy" or cat.startswith("fusion:copy"):
            sig = name.split("=", 1)[-1].strip()[:86]
            copies[sig] += ms
    out.append("\ntop 10 copy signatures by accumulated device time:")
    for sig, ms in sorted(copies.items(), key=lambda kv: -kv[1])[:10]:
        out.append(f"  {ms:8.2f} ms  {sig}")
    return "\n".join(out)


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--summarize":
        print(summarize(sys.argv[2]))  # re-analyze an existing trace dir
        return
    logdir = tempfile.mkdtemp(prefix="trace_train_")
    capture(logdir)
    summary = summarize(logdir)
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
