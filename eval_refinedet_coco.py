#!/usr/bin/env python
"""COCO/SSDD evaluation driver (CLI parity with the reference's
``eval_refinedet_coco.py``).

Checkpoint sweep over trained epochs -> batched jitted inference + fused
on-device per-class NMS -> numpy COCOeval stats -> ap_stats.json +
best-epoch report + FPS/p50 (reference flow SURVEY.md §3.2).

Accepts both this framework's Orbax checkpoints and reference-format torch
``.pth`` files (imported via models/torch_import.py).
"""

import argparse
import os
import os.path as osp

import numpy as np

from refinedet_tpu import config as C
from refinedet_tpu.config import DetectConfig
from refinedet_tpu.data import BaseTransform, COCODetection
from refinedet_tpu.eval import Evaluator
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.utils.plot import plot_map


def parse_args():
    p = argparse.ArgumentParser(description="RefineDet COCO/SSDD eval")
    p.add_argument("--input_size", default="512", choices=["320", "512"])
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--image_set", default="test",
                   help="test / test_inshore / test_offshore")
    p.add_argument("--trained_model", default=None,
                   help="single checkpoint to evaluate")
    p.add_argument("--prefix", default="weights/",
                   help="checkpoint dir for --sweep")
    p.add_argument("--sweep", action="store_true",
                   help="evaluate the reference epoch schedule 200..295+final")
    p.add_argument("--save_folder", default="eval/")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--top_k", default=1000, type=int)
    p.add_argument("--keep_top_k", default=500, type=int)
    p.add_argument("--nms_top_k", default=0, type=int,
                   help="static per-class pre-NMS candidate cap on device "
                        "(default 0 = use --top_k, the reference's cap; "
                        "smaller trades recall for NMS speed)")
    p.add_argument("--confidence_threshold", default=0.01, type=float)
    p.add_argument("--nms_threshold", default=0.49, type=float)
    p.add_argument("--objectness_thre", default=0.01, type=float)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ twin (refinedet_tpu/quant): "
                        "per-checkpoint max-calibration on --calib_images "
                        "eval images, then int8 trunk/TCB inference")
    p.add_argument("--calib_images", default=16, type=int)
    p.add_argument("--calib_act_stat", default="p9999",
                   choices=["amax", "p9999", "p999", "p99"],
                   help="activation clip point for int8 calibration")
    p.add_argument("--quant_skip", default=None,
                   help="comma-separated conv names kept bf16 under --int8 "
                        "(default: the early-VGG set, quant.DEFAULT_QUANT_"
                        "SKIP; pass '' to quantize everything)")
    p.add_argument("--save_quantized", default=None,
                   help="with --int8 --trained_model: save the calibrated "
                        "int8 variables as an Orbax checkpoint here "
                        "(restores without recalibration)")
    p.add_argument("--bias_correct", action="store_true",
                   help="with --int8: fold the expected weight-rounding "
                        "output error into each quantized conv's bias "
                        "(DFQ-style, from the calibration input means)")
    p.add_argument("--weight_opt", default="none", choices=["none", "gptq"],
                   help="with --int8: weight rounding — round-to-nearest "
                        "(none) or the second-order GPTQ solver "
                        "(refinedet_tpu/quant/gptq.py, needs the "
                        "calibration stream twice)")
    p.add_argument("--use_ema", action="store_true",
                   help="serve the EMA weights (TrainState.ema_params "
                        "from an --ema_decay run) instead of raw params")
    p.add_argument("--show_image", action="store_true",
                   help="write per-image PNGs with GT (green) vs "
                        "detections >= --vis_thres (red) to "
                        "<save_folder>/images (reference "
                        "eval_refinedet_coco.py:182-198,236-256)")
    p.add_argument("--vis_thres", default=0.3, type=float)
    return p.parse_args()


def draw_detections(dataset, all_boxes, out_dir, vis_thres=0.3):
    """GT (green) vs detections (red) overlays, one PNG per image."""
    import cv2
    os.makedirs(out_dir, exist_ok=True)

    def clip_pts(vals, h, w):
        # clip before int(): degenerate detections can decode to values
        # beyond C-int range, which cv2 rejects
        x1, y1, x2, y2 = (float(np.nan_to_num(v)) for v in vals)
        return (int(np.clip(x1, 0, w - 1)), int(np.clip(y1, 0, h - 1)),
                int(np.clip(x2, 0, w - 1)), int(np.clip(y2, 0, h - 1)))

    for i in range(len(dataset)):
        img, gt = dataset.pull_image(i)
        img = img.copy()
        h, w = img.shape[:2]
        for row in gt:
            x1, y1, x2, y2 = clip_pts(row[:4], h, w)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 1)
        for cls_dets in all_boxes[1:]:
            for det in cls_dets[i]:
                if det[4] < vis_thres:
                    continue
                x1, y1, x2, y2 = clip_pts(det[:4], h, w)
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 1)
                cv2.putText(img, f"{det[4]:.2f}", (x1, max(y1 - 3, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 0, 255), 1)
        cv2.imwrite(osp.join(out_dir, f"{i:06d}.png"), img)


def make_loader(model, trainer_template=None, use_ema=False):
    """Returns load_fn(path) -> flax variables, handling .pth and Orbax.

    ``use_ema=True`` serves the EMA weights (TrainState.ema_params from a
    ``--ema_decay`` run) instead of the raw SGD params; it errors on
    checkpoints that carry none rather than silently falling back.
    """
    import jax

    def load(path):
        if str(path).endswith((".pth", ".pkl")):
            if use_ema:
                raise ValueError(
                    "--use_ema needs an Orbax TrainState checkpoint; "
                    ".pth files carry only raw weights")
            init = model.init(jax.random.PRNGKey(0))
            from refinedet_tpu.models.torch_import import load_weights
            params = load_weights(dict(init["params"]), str(path))
            return {"params": params}
        # Orbax checkpoints may be a bare variables dict or a full
        # TrainState (step/params/opt_state/batch_stats/ema_params) from
        # the Trainer; restore template-free and pick out the variables.
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(osp.abspath(path))
        if "params" in restored:
            params = restored["params"]
            if use_ema:
                if restored.get("ema_params") is None:
                    raise ValueError(
                        f"--use_ema: checkpoint {path} has no ema_params "
                        "(train with --ema_decay > 0)")
                params = restored["ema_params"]
            variables = {"params": params}
            if restored.get("batch_stats") is not None:
                variables["batch_stats"] = restored["batch_stats"]
            return variables
        if use_ema:
            raise ValueError(
                f"--use_ema: checkpoint {path} is a bare variables dict "
                "with no ema_params")
        return restored

    return load


def main():
    args = parse_args()
    size = int(args.input_size)
    root = args.dataset_root or C.COCOroot
    dataset = COCODetection(root, [("sarship", args.image_set)], None)
    num_classes = dataset.num_classes

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_refinedet("test", size, num_classes, dtype=dtype)
    cfg = DetectConfig(
        num_classes=num_classes, top_k=args.top_k,
        keep_top_k=args.keep_top_k, conf_thresh=args.confidence_threshold,
        nms_thresh=args.nms_threshold,
        objectness_thresh=args.objectness_thre)
    load_fn = make_loader(model, use_ema=args.use_ema)
    eval_model = model
    if args.int8:
        from refinedet_tpu.quant import (DEFAULT_QUANT_SKIP,
                                         calib_batches_from_dataset,
                                         calibrate_amax, quantize_variables)
        skip = (DEFAULT_QUANT_SKIP if args.quant_skip is None else
                tuple(s for s in args.quant_skip.split(",") if s))
        eval_model = build_refinedet("test", size, num_classes, dtype=dtype,
                                     quant=True, quant_skip=skip)
        load_f32 = load_fn

        def load_fn(path):
            variables = load_f32(path)
            params = variables.get("params", {})
            if any(isinstance(v, dict) and "kernel_q" in v
                   for v in params.values()):
                # Already-quantized checkpoint (saved by --save_quantized):
                # skip recalibration, but validate the quantized-conv set
                # against the requested --quant_skip up front — a mismatch
                # would otherwise surface much later as an opaque Flax
                # ScopeParamNotFoundError mid-inference.
                import jax
                template = jax.eval_shape(
                    lambda: eval_model.init(jax.random.PRNGKey(0)))
                want_q = {n for n, l in template["params"].items()
                          if "kernel_q" in l}
                have_q = {n for n, l in params.items()
                          if isinstance(l, dict) and "kernel_q" in l}
                if want_q != have_q:
                    raise ValueError(
                        f"quantized checkpoint {path!r} was saved with a "
                        "different --quant_skip than requested: checkpoint "
                        f"quantizes {sorted(have_q - want_q) or 'nothing extra'}"
                        f" that the requested model keeps bf16, and lacks "
                        f"{sorted(want_q - have_q) or 'nothing'}. Re-pass the "
                        "--quant_skip used at --save_quantized time.")
                print("restored pre-quantized checkpoint; --calib_images/"
                      "--calib_act_stat are ignored (scales were baked in "
                      "at --save_quantized time)")
                return variables
            calib = calib_batches_from_dataset(
                dataset, BaseTransform(size, C.MEANS),
                args.calib_images, args.batch_size)
            if args.weight_opt == "gptq":
                # the Hessian pass re-consumes the stream
                calib = list(calib)
            means = None
            if args.bias_correct:
                amax, means = calibrate_amax(model, variables, calib,
                                             return_means=True)
            else:
                amax = calibrate_amax(model, variables, calib)
            hessians = None
            if args.weight_opt == "gptq":
                from refinedet_tpu.quant.gptq import accumulate_hessians
                hessians = accumulate_hessians(model, variables, calib)
            return quantize_variables(eval_model, variables, amax,
                                      act_stat=args.calib_act_stat,
                                      means=means, hessians=hessians)

    evaluator = Evaluator(eval_model, dataset, cfg,
                          BaseTransform(size, C.MEANS),
                          batch_size=args.batch_size,
                          nms_top_k=args.nms_top_k,
                          max_per_image=args.keep_top_k)
    save_folder = osp.join(args.save_folder,
                           osp.basename(args.prefix.rstrip("/")))

    if args.sweep:
        # Reference epoch schedule (eval_refinedet_coco.py:328-336).
        epochs = list(range(200, 300, 5))
        ckpts = [osp.join(args.prefix,
                          f"RefineDet{size}_COCO_epoches_{e}")
                 for e in epochs]
        ckpts.append(osp.join(args.prefix,
                              f"RefineDet{size}_COCO_epoches_final"))
        epochs.append(300)
        pairs = [(c, e) for c, e in zip(ckpts, epochs)
                 if osp.exists(c) or osp.exists(c + ".pth")]
        # the reference prints every model path it sweeps
        # (eval_refinedet_coco.py:336-349); log what exists AND what was
        # skipped so a hole in the epoch schedule is visible
        missing = [(c, e) for c, e in zip(ckpts, epochs)
                   if (c, e) not in pairs]
        for c, e in pairs:
            print(f"sweep: epoch {e}: {c}")
        for c, e in missing:
            print(f"sweep: epoch {e}: MISSING ({c}[.pth]) — skipped")
        ckpts = [c if osp.exists(c) else c + ".pth" for c, _ in pairs]
        epochs = [e for _, e in pairs]
        stats = evaluator.sweep(ckpts, load_fn, epochs, save_folder)
        if stats["epoch"]:
            plot_map(osp.join(save_folder, "ap_stats.json"),
                     osp.join(save_folder, "ap_curve.png"))
    else:
        assert args.trained_model, "--trained_model or --sweep required"
        variables = load_fn(args.trained_model)
        print("Finished loading model!")
        if args.int8 and args.save_quantized:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(osp.abspath(args.save_quantized), variables)
            ckptr.wait_until_finished()
            print(f"quantized variables saved -> {args.save_quantized}")
        all_boxes = evaluator.run(variables)
        if args.show_image:
            draw_detections(dataset, all_boxes,
                            osp.join(save_folder, "images"),
                            args.vis_thres)
        print("Evaluating detections")
        stats = dataset.evaluate_detections(all_boxes, save_folder)
        print("AP stats:", np.round(stats[:6], 4))


if __name__ == "__main__":
    main()
