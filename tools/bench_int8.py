"""Int8 serving-path benchmark: bf16 vs int8 RefineDet320 inference
throughput on one chip, measured honestly (N dependent forwards chained
inside one XLA program — through the dev tunnel, unchained dispatch
timing of identical executions is unreliable).

Uses random-init weights + max-calibration on a random batch; accuracy of
the quantized path is covered by tests/test_quant.py (closeness) and
tools/smoke_int8.py (trained-model AP).
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


def measure(m, v, tag):
    @jax.jit
    def chained(vv, img):
        def body(_, x):
            boxes, scores = m.apply(vv, x)
            return x + 0.0 * (boxes.sum() + scores.sum())
        return jax.lax.fori_loop(0, N, body, img)

    t0 = time.time()
    jax.block_until_ready(chained(v, images))
    print(f"{tag}: compile+first {time.time()-t0:.0f}s", file=sys.stderr)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(chained(v, images))
        best = min(best, (time.time() - t0) / N)
    print(f"{tag}: {best*1e3:.2f} ms/batch of {BATCH} -> "
          f"{BATCH/best:.0f} img/s")
    return best


t16 = measure(model, variables, "bf16")
t8 = measure(model_q, vq, "int8")
print(f"int8 speedup over bf16: {t16/t8:.3f}x")
