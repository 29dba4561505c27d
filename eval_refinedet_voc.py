#!/usr/bin/env python
"""VOC2007-test evaluation driver (CLI parity with the reference's
``eval_refinedet_voc.py``).

Batched jitted inference + on-device per-class NMS over VOC2007 test, the
official per-class result files, and 11-point (or AUC) AP via
refinedet_tpu.eval.voc_eval (reference flow SURVEY.md §3.4 — note the
reference file as committed crashes on the raw-output detector; this driver
is the working equivalent of its intended path).
"""

import argparse
import os.path as osp


from refinedet_tpu import config as C
from refinedet_tpu.config import DetectConfig
from refinedet_tpu.data import BaseTransform, VOC_CLASSES, VOCDetection
from refinedet_tpu.eval import Evaluator, evaluate_voc, write_voc_results_files
from refinedet_tpu.models import build_refinedet


def parse_args():
    p = argparse.ArgumentParser(description="RefineDet VOC eval")
    p.add_argument("--input_size", default="320", choices=["320", "512"])
    p.add_argument("--trained_model", required=True)
    p.add_argument("--voc_root", default=None)
    p.add_argument("--year", default="2007")
    p.add_argument("--image_set", default="test")
    p.add_argument("--save_folder", default="eval/")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--confidence_threshold", default=0.01, type=float)
    p.add_argument("--nms_threshold", default=0.45, type=float)
    p.add_argument("--objectness_thre", default=0.01, type=float)
    p.add_argument("--top_k", default=1000, type=int)
    p.add_argument("--nms_top_k", default=300, type=int)
    p.add_argument("--det_shift", default=1.0, type=float,
                   help="detection-coordinate offset applied during AP "
                        "matching; 1.0 (default) reproduces the "
                        "reference chain's 1-based-result-file vs "
                        "0-based-GT quirk exactly, 0.0 evaluates "
                        "geometrically aligned")
    p.add_argument("--use_07_metric", default=True,
                   type=lambda v: v.lower() not in ("0", "false", "no"),
                   help="11-point VOC2007 AP (true) or every-point AUC AP "
                        "(false)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ twin (refinedet_tpu/quant), "
                        "max-calibrated on --calib_images eval images")
    p.add_argument("--calib_images", default=16, type=int)
    p.add_argument("--calib_act_stat", default="p9999",
                   choices=["amax", "p9999", "p999", "p99"],
                   help="activation clip point for int8 calibration")
    p.add_argument("--quant_skip", default=None,
                   help="comma-separated conv names kept bf16 under --int8 "
                        "(default: quant.DEFAULT_QUANT_SKIP)")
    p.add_argument("--use_ema", action="store_true",
                   help="serve the EMA weights (TrainState.ema_params "
                        "from an --ema_decay run) instead of raw params")
    p.add_argument("--bias_correct", action="store_true",
                   help="with --int8: fold the expected weight-rounding "
                        "output error into each quantized conv's bias "
                        "(DFQ-style, from the calibration input means)")
    p.add_argument("--weight_opt", default="none", choices=["none", "gptq"],
                   help="with --int8: weight rounding — round-to-nearest "
                        "(none) or the second-order GPTQ solver "
                        "(refinedet_tpu/quant/gptq.py, needs the "
                        "calibration stream twice)")
    return p.parse_args()


def main():
    args = parse_args()
    size = int(args.input_size)
    root = args.voc_root or C.VOC_ROOT
    dataset = VOCDetection(root, [(args.year, args.image_set)], None)
    num_classes = len(VOC_CLASSES) + 1

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_refinedet("test", size, num_classes, dtype=dtype)
    cfg = DetectConfig(
        num_classes=num_classes, top_k=args.top_k, keep_top_k=args.top_k,
        conf_thresh=args.confidence_threshold,
        nms_thresh=args.nms_threshold,
        objectness_thresh=args.objectness_thre)
    from eval_refinedet_coco import make_loader
    variables = make_loader(model, use_ema=args.use_ema)(args.trained_model)
    eval_model = model
    if args.int8:
        from refinedet_tpu.quant import (DEFAULT_QUANT_SKIP,
                                         calib_batches_from_dataset,
                                         quantize_model)
        skip = (DEFAULT_QUANT_SKIP if args.quant_skip is None else
                tuple(s for s in args.quant_skip.split(",") if s))
        eval_model, variables = quantize_model(
            model, variables,
            calib_batches_from_dataset(
                dataset, BaseTransform(size, C.VOC_MEANS),
                args.calib_images, args.batch_size),
            dtype=dtype, act_stat=args.calib_act_stat, quant_skip=skip,
            bias_correct=args.bias_correct, weight_opt=args.weight_opt)
    # The reference VOC path ran the torch NMS (no +1 area convention,
    # box_utils.py:241), unlike the COCO path's C/CUDA NMS.
    evaluator = Evaluator(eval_model, dataset, cfg,
                          BaseTransform(size, C.VOC_MEANS),
                          batch_size=args.batch_size,
                          nms_top_k=args.nms_top_k, plus_one=False)
    print("Finished loading model!")
    all_boxes = evaluator.run(variables)

    out_dir = osp.join(args.save_folder, f"voc{args.year}")
    write_voc_results_files(
        all_boxes, [i[1] for i in dataset.ids], VOC_CLASSES, out_dir)
    aps = evaluate_voc(all_boxes, dataset, VOC_CLASSES,
                       use_07_metric=args.use_07_metric,
                       det_shift=args.det_shift)
    # det_shift printed so logs are self-describing: 1.0 reproduces the
    # reference chain's 1-based-result-file vs 0-based-GT offset
    # (eval_refinedet_voc.py:160-162,117-120); --det_shift 0 opts out.
    print(f"mAP: {aps['mAP']:.4f} (det_shift={args.det_shift})")
    return aps


if __name__ == "__main__":
    main()
