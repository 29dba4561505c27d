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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    p.add_argument("--batch_size", type=int, default=0,
                   help="serving: fixed batch; 0 = symbolic (any batch)")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="serving: comma-separated export platforms")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from refinedet_tpu.models import build_refinedet
    from eval_refinedet_coco import make_loader

    phase = "test" if args.format == "serving" else "train"
    model = build_refinedet(phase, args.input_size, args.num_classes,
                            use_bn=args.bn)
    variables = make_loader(model)(args.checkpoint)

    if args.format == "torch":
        from refinedet_tpu.models.torch_export import save_torch_checkpoint
        save_torch_checkpoint(variables, args.out, use_bn=args.bn)
        print(f"wrote reference-loadable state_dict: {args.out}")
        return

    from refinedet_tpu.serve import save_serving
    meta = save_serving(
        model, variables, args.out,
        batch_size=args.batch_size or None,
        platforms=tuple(s.strip() for s in args.platforms.split(",") if s))
    size = os.path.getsize(args.out)
    print(f"wrote serving artifact: {args.out} ({size / 1e6:.1f} MB)")
    for k in ("input_size", "num_classes", "batch_size", "platforms"):
        print(f"  {k}: {meta[k]}")


if __name__ == "__main__":
    main()
