"""Export a trained checkpoint for deployment.

Two targets, one CLI:

  serving  — AOT StableHLO artifact (refinedet_tpu.serve): the whole jitted
             inference function with weights baked in; the serving host
             needs only jax + the file. Symbolic batch by default.
  torch    — reference-loadable ``.pth`` (models/torch_export): a
             TPU-trained checkpoint becomes a state_dict the reference
             nets (/root/reference/models/refinedet.py,
             refinedet_bn.py) strict-load verbatim.

Input checkpoints may be Orbax (bare variables or full TrainState) or a
reference ``.pth`` — the same loader the eval driver uses.

Examples:
  python tools/export_serving.py --checkpoint weights/RefineDet320_COCO_epoches_final \
      --input_size 320 --num_classes 2 --out refinedet320.rdtpu
  python tools/export_serving.py --format torch --checkpoint ... --out refinedet320.pth
"""

import argparse
import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# APPEND, never insert(0): tests run this in-process after
# tests/reference_modules.py has put /root/reference at the head of
# sys.path, and prepending the repo root would flip which
# eval_refinedet_voc.py (ours vs the reference's — same filename) later
# name-based imports resolve to.
if _REPO not in sys.path:
    sys.path.append(_REPO)


def _load_make_loader():
    """Our eval_refinedet_coco.make_loader, resolved BY FILE PATH — the
    reference tree has a module with the same name, so a name-based import
    is ambiguous when both roots are on sys.path."""
    path = os.path.join(_REPO, "eval_refinedet_coco.py")
    mod = sys.modules.get("eval_refinedet_coco")
    if mod is not None and os.path.abspath(
            getattr(mod, "__file__", "")) == path:
        return mod.make_loader
    spec = importlib.util.spec_from_file_location(
        "_refinedet_tpu_eval_coco", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_loader


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--format", choices=("serving", "torch"),
                   default="serving")
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoint (dir) or reference .pth")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--input_size", type=int, default=320,
                   choices=(320, 512, 896))
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--bn", action="store_true", help="BN variant")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="compute dtype baked into the artifact (matches "
                        "the eval drivers' serving default)")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA weights (TrainState.ema_params "
                        "from an --ema_decay run) instead of raw params")
    p.add_argument("--int8", action="store_true",
                   help="serving: export the int8 PTQ twin from a "
                        "PRE-QUANTIZED Orbax checkpoint (written by "
                        "eval_refinedet_coco.py --int8 --save_quantized)")
    p.add_argument("--quant_skip", default=None,
                   help="with --int8: conv names kept bf16, matching the "
                        "checkpoint's set (default: quant.DEFAULT_QUANT_SKIP)")
    p.add_argument("--batch_size", type=int, default=0,
                   help="serving: fixed batch; 0 = symbolic (any batch)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="serving: comma-separated export platforms; "
                        "'tpu' ALONE bakes the Pallas NMS into a "
                        "--fused_nms artifact (fastest TPU serving)")
    p.add_argument("--fused_nms", action="store_true",
                   help="serving: bake decode + per-class NMS + compaction "
                        "into the artifact — output dets[b, C-1, K, 5] "
                        "instead of raw (boxes, scores); ~100x smaller "
                        "responses")
    # Fused-NMS knobs default to None = "inherit the library defaults"
    # (DetectConfig.nms_thresh=0.49 etc. — the COCO-eval post-processing
    # export.py promises); a flagless export must reproduce the Evaluator,
    # so only user-set values are forwarded. Pass e.g. --nms_threshold
    # 0.45 explicitly for the VOC-eval convention.
    p.add_argument("--nms_top_k", type=int, default=None,
                   help="with --fused_nms: per-class survivors kept "
                        "(default: library default, 200)")
    p.add_argument("--nms_threshold", type=float, default=None,
                   help="default: DetectConfig.nms_thresh (0.49, COCO "
                        "eval); the VOC eval path uses 0.45")
    p.add_argument("--confidence_threshold", type=float, default=None,
                   help="default: DetectConfig.conf_thresh")
    p.add_argument("--uint8_wire", action="store_true",
                   help="serving: artifact accepts raw uint8 RGB pixels "
                        "and mean-subtracts on device — 4x less "
                        "host->device upload (exact for integer pixels)")
    p.add_argument("--input_mean", default=None,
                   help="with --uint8_wire: comma-separated per-channel "
                        "mean in the reference's BGR config convention "
                        "(default 104,117,123; SAR/SSDD uses "
                        "98.13131,98.13131,98.13131)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from refinedet_tpu.models import build_refinedet

    make_loader = _load_make_loader()

    if args.int8 and args.format == "torch":
        raise SystemExit("--int8 applies to --format serving only "
                         "(the reference stack has no int8 path)")
    import jax.numpy as jnp

    phase = "test" if args.format == "serving" else "train"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.int8:
        from refinedet_tpu.quant import DEFAULT_QUANT_SKIP
        skip = (DEFAULT_QUANT_SKIP if args.quant_skip is None else
                tuple(s for s in args.quant_skip.split(",") if s))
        model = build_refinedet(phase, args.input_size, args.num_classes,
                                use_bn=args.bn, dtype=dtype, quant=True,
                                quant_skip=skip)
    else:
        model = build_refinedet(phase, args.input_size, args.num_classes,
                                use_bn=args.bn, dtype=dtype)
    variables = make_loader(model, use_ema=args.use_ema)(args.checkpoint)
    if args.int8:
        import jax

        paths = jax.tree.flatten_with_path(variables)[0]
        if not any("kernel_q" in str(path) for path, _ in paths):
            raise SystemExit(
                f"--int8: {args.checkpoint} holds no quantized convs; write "
                "one with eval_refinedet_coco.py --int8 --save_quantized "
                "first")

    if args.format == "torch":
        from refinedet_tpu.models.torch_export import save_torch_checkpoint
        save_torch_checkpoint(variables, args.out, use_bn=args.bn)
        print(f"wrote reference-loadable state_dict: {args.out}")
        return

    from refinedet_tpu.serve import save_serving
    fused = None
    if args.fused_nms:
        fused = {k: v for k, v in (
            ("nms_thresh", args.nms_threshold),
            ("conf_thresh", args.confidence_threshold),
            ("nms_top_k", args.nms_top_k)) if v is not None}
    mean = None
    if args.input_mean is not None:
        if not args.uint8_wire:
            raise SystemExit("--input_mean requires --uint8_wire")
        mean = tuple(float(s) for s in args.input_mean.split(","))
    meta = save_serving(
        model, variables, args.out,
        batch_size=args.batch_size or None,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s),
        fused_nms=fused, uint8_input=args.uint8_wire, input_mean=mean)
    size = os.path.getsize(args.out)
    print(f"wrote serving artifact: {args.out} ({size / 1e6:.1f} MB)")
    for k in ("input_size", "num_classes", "batch_size", "platforms"):
        print(f"  {k}: {meta[k]}")


if __name__ == "__main__":
    main()
