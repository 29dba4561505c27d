"""Int8 serving-path benchmark: bf16 vs int8 RefineDet inference
throughput on one chip, measured honestly (N dependent forwards chained
inside one XLA program, with a returned-and-fetched scalar accumulator —
through the dev tunnel, anything less gets elided; see
.claude/skills/verify/SKILL.md "Benchmarking through the tunnel").

Besides the full serving path (backbone + heads + softmax + cascade
decode — the reference's live Detect_RefineDet path,
/root/reference/layers/functions/detection_refinedet.py:27-65), also
times the heads-only forward (convs, the part int8 accelerates) as a
probe of the precision-independent decode/softmax share. Measured
result: that share is ~0% at BOTH sizes (XLA fuses/overlaps the
post-processing with the convs; heads-only speedup == full-path
speedup). The earlier observation of 512's int8 gain trailing 320's
was a batch-occupancy artifact at b64 — at b128 512 reaches 1.45x,
matching 320 (see README "Performance" table).

Uses random-init weights + max-calibration on a random batch; accuracy of
the quantized path is covered by tests/test_quant.py (closeness),
tools/smoke_int8.py (trained-model AP) and tools/ablate_int8.py
(multi-seed ablation).

Usage: python tools/bench_int8.py [batch] [size]
"""
import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from refinedet_tpu.models import build_refinedet
from refinedet_tpu.quant import quantize_model

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 320
N = 10

rng = np.random.RandomState(0)
images = jnp.asarray(
    rng.uniform(-120, 130, (BATCH, SIZE, SIZE, 3)).astype(np.float32))

model = build_refinedet("test", SIZE, 21, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0))
model_q, vq = quantize_model(model, variables, [images[:8]])


def measure(m, v, tag, heads_only=False):
    def fwd(vv, x):
        if heads_only:
            return m.raw_forward(vv, x)  # convs only, no decode/softmax
        return m.apply(vv, x)

    @jax.jit
    def chained(vv, img):
        def body(_, carry):
            x, acc = carry
            out = fwd(vv, x)
            val = sum(o.sum() for o in out).astype(jnp.float32)
            return (x + val * 1e-12, acc + val)
        return jax.lax.fori_loop(0, N, body, (img, jnp.float32(0.0)))

    t0 = time.time()
    float(chained(v, images + 1.0)[1])  # compile + first (one-time costs)
    print(f"{tag}: compile+first {time.time() - t0:.0f}s", file=sys.stderr)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(chained(v, images)[1])  # fetch accumulator: forces execution
        best = min(best, (time.time() - t0) / N)
    print(f"{tag}: {best * 1e3:.2f} ms/batch of {BATCH} -> "
          f"{BATCH / best:.0f} img/s")
    return best


t16 = measure(model, variables, f"bf16-{SIZE} full")
t8 = measure(model_q, vq, f"int8-{SIZE} full")
h16 = measure(model, variables, f"bf16-{SIZE} heads", heads_only=True)
h8 = measure(model_q, vq, f"int8-{SIZE} heads", heads_only=True)

print(f"int8 speedup over bf16 (full serving path): {t16 / t8:.3f}x")
print(f"int8 speedup over bf16 (heads/convs only):  {h16 / h8:.3f}x")
print(f"decode+softmax share: bf16 {(t16 - h16) * 1e3:.2f} ms "
      f"({(t16 - h16) / t16 * 100:.1f}%), int8 {(t8 - h8) * 1e3:.2f} ms "
      f"({(t8 - h8) / t8 * 100:.1f}%)")
