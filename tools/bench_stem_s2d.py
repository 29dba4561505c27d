"""Measure the space-to-depth stem against the standard model (real chip).

Answers the question RefineDet.stem_s2d's docstring poses: does full MXU
fill (256-ch stem) + the folded pool1 pay for the structural 16/9 stem
FLOP overhead? Methodology per .claude/skills/verify/SKILL.md
"Benchmarking through the tunnel": N dependent iterations inside one jit
program, a carried+returned+fetched scalar accumulator, timed twice
keeping the second.

Usage:  python tools/bench_stem_s2d.py [--batch 128] [--iters 20]
"""

import argparse
import os.path as _osp
import sys
import time

sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import numpy as np


def chained_throughput(model, variables, images, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(v, img):
        def body(_, carry):
            x, acc = carry
            boxes, scores = model.apply(v, x)
            val = (boxes.sum() + scores.sum()).astype(jnp.float32)
            return (x + val * 1e-12, acc + val)
        return jax.lax.fori_loop(0, iters, body, (img, jnp.float32(0.0)))

    jax.block_until_ready(chained(variables, images + 1.0))  # compile
    for _ in range(2):
        t0 = time.time()
        out = chained(variables, images)
        float(out[1])  # fetch: forces real execution through the relay
        dt = time.time() - t0
    return images.shape[0] * iters / dt, dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=320)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from refinedet_tpu.models import build_refinedet, fold_stem_variables

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    m0 = build_refinedet("test", args.size, 21, dtype=jnp.bfloat16)
    m1 = build_refinedet("test", args.size, 21, dtype=jnp.bfloat16,
                         stem_s2d=True)
    v0 = m0.init(jax.random.PRNGKey(0))
    v1 = fold_stem_variables(v0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(
        -120, 130, (args.batch, args.size, args.size, 3)).astype(np.float32))

    ips0, ms0 = chained_throughput(m0, v0, images, args.iters)
    print(f"standard  : {ips0:8.1f} img/s  ({ms0:.2f} ms / b{args.batch})",
          flush=True)
    ips1, ms1 = chained_throughput(m1, v1, images, args.iters)
    print(f"stem_s2d  : {ips1:8.1f} img/s  ({ms1:.2f} ms / b{args.batch})",
          flush=True)
    print(f"speedup   : {ips1 / ips0:.3f}x", flush=True)


if __name__ == "__main__":
    main()
