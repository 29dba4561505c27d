"""Shared xplane-proto trace summarizer for the trace_* tools.

Parses a ``jax.profiler`` trace directory's ``*.xplane.pb`` directly
(tensorflow.tsl xplane proto; no tensorboard UI needed) and reports:

  * per-execution device time from the "XLA Modules" line,
  * device idle between consecutive module executions = dispatch gap,
  * an op-category split (convolution / fusion-by-kind / copy / ...)
    and top ops from the "XLA Ops" line,
  * true layout-copy signatures (the lead list for layout tuning).

Used by tools/trace_train_step.py (train step) and tools/trace_infer.py
(inference path).
"""

import glob
import os
import re
from collections import defaultdict

# The bundled tensorboard/tsl *_pb2 modules predate protobuf 5's generated
# -code check; pure-python parsing sidesteps it (slower, fine for one file).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


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


def summarize(logdir: str, batch: int) -> str:
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
    out.append("per-execution device time (ms): "
               + ", ".join(f"{d:.2f}" for d in durs))
    out.append("dispatch gaps between executions (ms): "
               + (", ".join(f"{g:.3f}" for g in gaps) or "n/a"))
    busy = sum(durs)
    out.append(f"device busy {busy:.2f} ms / span {span:.2f} ms "
               f"-> idle {(span - busy) / span * 100:.2f}% of the traced "
               "window (back-to-back dispatch)")
    out.append(f"throughput implied by device time: "
               f"{batch / (busy / len(mods)) * 1000:.0f} img/s")

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
