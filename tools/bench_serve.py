"""Serving-host benchmark: requests/sec and latency through the
micro-batching engine (refinedet_tpu/serve/server.py) on the current
default backend (the real TPU chip when the tunnel is up).

Two measurements, separated so HTTP overhead is attributable:

  engine  — N worker threads submit images straight into
            BatchingEngine.submit() and block on the Futures.
  http    — the same load through the full HTTP wire format
            (POST /detect with raw wire-dtype bytes — f32, or uint8
            with --uint8_wire — .npz response).

Every request's outputs are fetched to the host (the engine returns
numpy per request), so nothing here can be elided by the dev tunnel's
relay — but per-batch device->host output transfer (~0.6 MB/img at 320,
21 classes) rides the tunnel on this box, so absolute numbers are a
lower bound for a real TPU VM with PCIe to the chip; the realized-batch
histogram and the engine-vs-http delta are the portable findings.

Usage:
  python tools/bench_serve.py [--size 320] [--num_classes 21]
      [--clients 64] [--requests 256] [--max_batch 32]
      [--artifact path.rdtpu]     # else: export random weights to a tmp
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=320, choices=(320, 512, 896))
    p.add_argument("--num_classes", type=int, default=21)
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--max_delay_ms", type=float, default=5.0)
    p.add_argument("--artifact", default=None,
                   help="pre-exported .rdtpu; default exports random "
                        "weights (throughput does not depend on values)")
    p.add_argument("--fused_nms", action="store_true",
                   help="with the default export: bake the fused "
                        "post-processing (decode + per-class NMS) into "
                        "the artifact, current-platform only — hosts "
                        "receive dets[C-1,K,5] instead of raw heads")
    p.add_argument("--uint8_wire", action="store_true",
                   help="with the default export: uint8-input artifact "
                        "(raw pixels on the wire, in-artifact mean-sub) — "
                        "4x less host->device upload than the f32 wire")
    p.add_argument("--int8", action="store_true",
                   help="with the default export: PTQ-quantize the random "
                        "weights (throughput is value-independent) and "
                        "bench the int8 serving twin")
    p.add_argument("--skip_http", action="store_true")
    return p.parse_args()


def drive(submit_fn, images, n_clients, n_requests):
    """n_clients threads round-robin n_requests submissions; returns
    (wall seconds, successful-request latencies, error list)."""
    lat = [None] * n_requests
    errors = []
    idx_lock = threading.Lock()
    next_idx = [0]

    def worker():
        while True:
            with idx_lock:
                i = next_idx[0]
                if i >= n_requests:
                    return
                next_idx[0] += 1
            t0 = time.monotonic()
            try:
                submit_fn(images[i % len(images)])
            except Exception as e:  # count, don't crash the measurement
                with idx_lock:
                    errors.append(f"req {i}: {e!r}")
                continue
            lat[i] = time.monotonic() - t0

    threads = [threading.Thread(target=worker) for _ in range(n_clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return (time.monotonic() - t0,
            np.array([l for l in lat if l is not None]), errors)


def _leg_stats(lat, wall, errors):
    out = {
        "ok": int(lat.size),
        "errors": len(errors),
        "req_per_s": round(lat.size / wall, 1) if lat.size else 0.0,
    }
    if lat.size:
        out["p50_ms"] = round(float(np.median(lat)) * 1e3, 1)
        out["p99_ms"] = round(float(np.percentile(lat, 99)) * 1e3, 1)
    if errors:
        out["first_error"] = errors[0]
        print(f"  {len(errors)} failed requests; first: {errors[0]}",
              file=sys.stderr, flush=True)
    return out


def main():
    args = parse_args()
    from refinedet_tpu.serve import (BatchingEngine, Server, client_detect,
                                     load_serving, save_serving)

    artifact = args.artifact
    if artifact is None:
        import jax
        from refinedet_tpu.models import build_refinedet

        model = build_refinedet("test", args.size, args.num_classes)
        variables = model.init(jax.random.PRNGKey(0))
        if args.int8:
            from refinedet_tpu.quant import quantize_model

            calib = [np.random.RandomState(1).uniform(
                -120, 130, (4, args.size, args.size, 3)).astype(np.float32)]
            model, variables = quantize_model(model, variables, calib)
        artifact = os.path.join(tempfile.mkdtemp(prefix="bench_serve_"),
                                f"refinedet{args.size}.rdtpu")
        kw = {"uint8_input": True} if args.uint8_wire else {}
        if args.fused_nms:
            # current platform only: cross-platform fused exports would
            # bake the portable XLA NMS instead of the Pallas kernel
            save_serving(model, variables, artifact,
                         platforms=(jax.default_backend(),), fused_nms={},
                         **kw)
        else:
            save_serving(model, variables, artifact, **kw)
    serving = load_serving(artifact)
    size = serving.meta["input_size"]
    wire_dtype = serving.input_dtype

    rng = np.random.RandomState(0)
    if wire_dtype == np.uint8:  # raw-pixel wire
        images = [rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
                  for _ in range(8)]
    else:
        images = [rng.uniform(-120, 130, (size, size, 3)).astype(np.float32)
                  for _ in range(8)]

    engine = BatchingEngine(serving, (size, size, 3),
                            max_batch=args.max_batch,
                            max_delay_ms=args.max_delay_ms,
                            input_dtype=wire_dtype)
    print(f"warming {len(engine.buckets)} buckets "
          f"{list(engine.buckets)} ...", file=sys.stderr, flush=True)
    for b in engine.buckets:
        t0 = time.monotonic()
        serving(np.zeros((b, size, size, 3), wire_dtype))
        print(f"  bucket {b}: {time.monotonic() - t0:.1f}s",
              file=sys.stderr, flush=True)

    results = {}
    with engine:
        # time twice, keep the second (first run of a fresh program can
        # absorb a one-time relay cost)
        for tag in ("engine-warm", "engine"):
            wall, lat, errs = drive(lambda im: engine.submit(im).result(),
                                    images, args.clients, args.requests)
            results[tag] = _leg_stats(lat, wall, errs)
            print(f"  leg {tag}: {results[tag]}", file=sys.stderr,
                  flush=True)
        stats_engine = engine.stats()

        if not args.skip_http:
            cd = "u1" if wire_dtype == np.uint8 else "<f4"
            with Server(engine, serving.meta, port=0) as srv:
                wall, lat, errs = drive(
                    lambda im: client_detect("127.0.0.1", srv.port, im,
                                             timeout=600, dtype=cd),
                    images, args.clients, args.requests)
                results["http"] = _leg_stats(lat, wall, errs)
                print(f"  leg http: {results['http']}", file=sys.stderr,
                      flush=True)

    out = {
        "size": size,
        "fused_nms": serving.meta.get("fused_nms") is not None,
        "int8": bool(serving.meta.get("int8", False)),
        "wire_dtype": wire_dtype.name,
        "clients": args.clients,
        "requests": args.requests,
        "max_batch": args.max_batch,
        "results": results,
        "batch_size_hist": stats_engine["batch_size_hist"],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
