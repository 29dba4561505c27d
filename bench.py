"""Benchmark: RefineDet320 inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

value    = batched test-phase inference throughput (backbone + heads +
           softmax + objectness filter + cascade decode, the reference's
           live Detect_RefineDet path) on the real chip.
vs_baseline = value / PyTorch-CPU throughput of the architecturally
           identical torch model (tools/torch_refinedet.py), the baseline
           BASELINE.json's ">=10x PyTorch-CPU" target refers to. The torch
           number is measured here too (cached in .bench_torch_cpu.json).

Extra diagnostics (batch-1 p50 latency, per-batch breakdown) go to stderr.

Tunnel resilience (round-2 verdict item #2): the tunneled axon TPU backend
can be transiently UNAVAILABLE (BENCH_r02 was rc 1 for exactly this), so
the measurement runs in a child process with a bounded per-attempt timeout
and up to MAX_ATTEMPTS retries with backoff; on final failure the parent
prints a parseable ``{"metric": ..., "error": ...}`` JSON line instead of
a traceback, so the driver can distinguish an infra outage from a code
regression. A hung (vs failing) attempt is not retried — a dead-hang
tunnel would eat the whole driver budget across retries.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# 128 is throughput-optimal on v5e (sweep: 8->1146, 128->1941 img/s);
# BENCH_BATCH overrides for local batch-size probes.
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
WARMUP = 3
ITERS = 20
MAX_ATTEMPTS = int(os.environ.get("BENCH_MAX_ATTEMPTS", "3"))
RETRY_BACKOFF_S = float(os.environ.get("BENCH_RETRY_BACKOFF_S", "60"))
ATTEMPT_TIMEOUT_S = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "600"))
TORCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_torch_cpu.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure_jax():
    import jax
    import jax.numpy as jnp
    from refinedet_tpu.models import build_refinedet

    log(f"devices: {jax.devices()}")
    model = build_refinedet("test", 320, 21, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    fn = jax.jit(model.apply)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(-120, 130, (BATCH, 320, 320, 3)).astype(np.float32))

    t0 = time.time()
    out = fn(params, images)
    jax.block_until_ready(out)
    log(f"compile+first batch: {time.time() - t0:.1f}s")

    for _ in range(WARMUP):
        jax.block_until_ready(fn(params, images))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(params, images)
    jax.block_until_ready(out)
    dt = time.time() - t0
    log(f"batched throughput (unchained dispatch, diagnostic): "
        f"{BATCH * ITERS / dt:.1f} img/s "
        f"({dt / ITERS * 1000:.2f} ms / batch of {BATCH})")

    # Headline number: ITERS dependent inferences inside ONE program.
    # Identical in-flight executions can get elided by the dev tunnel's
    # relay (see .claude/skills/verify/SKILL.md "Benchmarking through the
    # tunnel"), so the honest measurement serializes each iteration on the
    # previous one's output AND carries a returned-and-fetched scalar
    # accumulator over every op — carry idioms like `x + 0.0 * val` (or
    # even optimization_barrier) can still get their loop bodies deleted
    # by the relay's compile pipeline. The first timed execution of a
    # fresh program can absorb a one-time ~150 s relay cost, so time
    # twice and keep the second.
    @jax.jit
    def chained(variables, img):
        def body(_, carry):
            x, acc = carry
            boxes, scores = model.apply(variables, x)
            val = (boxes.sum() + scores.sum()).astype(jnp.float32)
            return (x + val * 1e-12, acc + val)
        return jax.lax.fori_loop(0, ITERS, body, (img, jnp.float32(0.0)))

    jax.block_until_ready(chained(params, images + 1.0))  # warmup/compile
    for _ in range(2):
        t0 = time.time()
        out = chained(params, images)
        float(out[1])  # fetch the accumulator: forces real execution
        dt = time.time() - t0
    throughput = BATCH * ITERS / dt
    log(f"batched throughput (chained, headline): {throughput:.1f} img/s "
        f"({dt / ITERS * 1000:.2f} ms / batch of {BATCH})")

    # batch-1 p50 latency (includes one host<->device round trip; through
    # the dev tunnel this is dominated by RPC overhead)
    one = images[:1]
    lat_fn = jax.jit(model.apply)
    jax.block_until_ready(lat_fn(params, one))
    lats = []
    for _ in range(30):
        t0 = time.time()
        jax.block_until_ready(lat_fn(params, one))
        lats.append(time.time() - t0)
    log(f"batch-1 p50 latency (incl. host RTT): "
        f"{np.median(lats) * 1000:.2f} ms")

    # device-only latency: chain N dependent inferences inside one program
    # so no host round trip is involved (same accumulator pattern as above)
    n_chain = 20

    @jax.jit
    def chained_b1(variables, img):
        def body(_, carry):
            x, acc = carry
            boxes, scores = model.apply(variables, x)
            val = (boxes.sum() + scores.sum()).astype(jnp.float32)
            return (x + val * 1e-12, acc + val)
        return jax.lax.fori_loop(0, n_chain, body, (img, jnp.float32(0.0)))

    jax.block_until_ready(chained_b1(params, one + 1.0))
    for _ in range(2):
        t0 = time.time()
        out = chained_b1(params, one)
        float(out[1])
        dt = time.time() - t0
    log(f"batch-1 device-only latency: {dt / n_chain * 1000:.2f} ms")
    return throughput


def measure_torch_cpu():
    if os.path.exists(TORCH_CACHE):
        with open(TORCH_CACHE) as f:
            cached = json.load(f)
        log(f"torch-cpu baseline (cached): {cached['img_per_sec']:.2f} img/s")
        return cached["img_per_sec"]

    import torch
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from torch_refinedet import TorchRefineDet

    torch.set_num_threads(os.cpu_count() or 8)
    model = TorchRefineDet(320, 21).eval()
    x = torch.randn(1, 3, 320, 320)
    with torch.no_grad():
        model(x)  # warmup
        n = 8
        t0 = time.time()
        for _ in range(n):
            model(x)
        dt = time.time() - t0
    ips = n / dt
    log(f"torch-cpu baseline: {ips:.2f} img/s ({dt / n * 1000:.1f} ms/img)")
    with open(TORCH_CACHE, "w") as f:
        json.dump({"img_per_sec": ips}, f)
    return ips


METRIC = "refinedet320_inference_throughput"


def run_measure():
    """Child mode: do the actual measurement, print ONE JSON line."""
    # Harness self-test hooks (tests/test_bench_harness.py): exercise the
    # parent's retry/parse/error plumbing without touching a backend.
    selftest = os.environ.get("BENCH_SELFTEST")
    if selftest == "ok":
        print(json.dumps({"metric": METRIC, "value": 1234.5,
                          "unit": "images/sec/chip", "vs_baseline": 10.0}),
              flush=True)
        return
    if selftest == "fail":
        raise RuntimeError("synthetic backend UNAVAILABLE (selftest)")
    if selftest == "hang":
        time.sleep(3600)
    jax_ips = measure_jax()
    try:
        torch_ips = measure_torch_cpu()
    except Exception as e:  # torch baseline failure must not kill the bench
        log(f"torch baseline failed: {e}")
        torch_ips = None
    vs = (jax_ips / torch_ips) if torch_ips else None
    print(json.dumps({
        "metric": METRIC,
        "value": round(jax_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }), flush=True)


def _parse_last_json(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    """Parent mode: run the measurement in a child process (fresh JAX
    backend state per attempt) with retry on failure."""
    me = os.path.abspath(__file__)
    last_err = "unknown"
    for attempt in range(1, MAX_ATTEMPTS + 1):
        log(f"bench attempt {attempt}/{MAX_ATTEMPTS}")
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, me, "--measure"], stdout=subprocess.PIPE,
                text=True, timeout=ATTEMPT_TIMEOUT_S)
        except subprocess.TimeoutExpired:
            # A hung backend init will hang on retry too; bail with a
            # structured error rather than burning MAX_ATTEMPTS timeouts.
            last_err = (f"attempt hung (> {ATTEMPT_TIMEOUT_S}s), "
                        "likely dead TPU tunnel; not retrying")
            log(last_err)
            break
        out = _parse_last_json(proc.stdout or "")
        if proc.returncode == 0 and out and out.get("value") is not None:
            print(json.dumps(out), flush=True)
            return 0
        tail = "\n".join((proc.stdout or "").strip().splitlines()[-3:])
        last_err = (f"rc={proc.returncode} after {time.time() - t0:.0f}s"
                    + (f": {tail}" if tail else ""))
        log(f"attempt {attempt} failed: {last_err}")
        if attempt < MAX_ATTEMPTS:
            log(f"retrying in {RETRY_BACKOFF_S}s")
            time.sleep(RETRY_BACKOFF_S)
    print(json.dumps({"metric": METRIC, "value": None,
                      "unit": "images/sec/chip", "vs_baseline": None,
                      "error": last_err[:500]}), flush=True)
    return 1


if __name__ == "__main__":
    if "--measure" in sys.argv:
        try:
            run_measure()
        except Exception as e:  # structured failure for the parent's parser
            log(f"measurement failed: {type(e).__name__}: {e}")
            print(json.dumps({"metric": METRIC, "value": None,
                              "error": f"{type(e).__name__}: {e}"[:500]}),
                  flush=True)
            sys.exit(1)
    else:
        sys.exit(main())
