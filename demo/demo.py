#!/usr/bin/env python
"""Single-image inference demo.

Counterpart of the reference's ``demo/demo.ipynb`` (cells 3-11): build the
test-phase net, preprocess one image (resize, mean-sub, BGR->RGB), run the
jitted forward + NMS, and draw every detection above the score threshold.

Usage: python demo/demo.py --image path/to/img.jpg --trained_model ckpt
"""

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2  # noqa: E402

from refinedet_tpu import config as C  # noqa: E402
from refinedet_tpu.config import DetectConfig  # noqa: E402
from refinedet_tpu.data import BaseTransform  # noqa: E402
from refinedet_tpu.detect import detect_refinedet_nms  # noqa: E402
from refinedet_tpu.data.voc import VOC_CLASSES  # noqa: E402
from refinedet_tpu.models import build_refinedet  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="RefineDet single-image demo")
    p.add_argument(
        "--image",
        default=osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                         "data", "example.jpg"),
        help="input image (default: data/example.jpg, as in the reference "
             "demo/demo.ipynb)")
    p.add_argument("--trained_model", default=None,
                   help=".pth or Orbax checkpoint (random weights if unset)")
    p.add_argument("--input_size", default="320", choices=["320", "512"])
    p.add_argument("--num_classes", default=21, type=int)
    p.add_argument("--threshold", default=0.6, type=float)
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--means", default="voc", choices=["voc", "sar"])
    p.add_argument("--int8", action="store_true",
                   help="serve the int8 PTQ twin, calibrated on this image")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    args = parse_args()
    size = int(args.input_size)
    means = C.VOC_MEANS if args.means == "voc" else C.MEANS
    model = build_refinedet("test", size, args.num_classes)
    if args.trained_model:
        from eval_refinedet_coco import make_loader
        variables = make_loader(model)(args.trained_model)
    else:
        print("WARNING: no --trained_model, using random weights")
        variables = model.init(jax.random.PRNGKey(0))

    img = cv2.imread(args.image, cv2.IMREAD_COLOR)
    assert img is not None, f"cannot read {args.image}"
    h, w = img.shape[:2]
    x = BaseTransform(size, means)(img)[None]

    if args.int8:
        from refinedet_tpu.quant import quantize_model
        model, variables = quantize_model(model, variables,
                                          [x.astype(np.float32)])

    heads = model.raw_forward(variables, jnp.asarray(x))
    arm_loc, arm_conf, odm_loc, odm_conf = heads
    cfg = DetectConfig(num_classes=args.num_classes, top_k=200,
                       keep_top_k=200, conf_thresh=0.01, nms_thresh=0.45)
    dets = np.asarray(detect_refinedet_nms(
        arm_loc, jax.nn.softmax(arm_conf, -1), odm_loc,
        jax.nn.softmax(odm_conf, -1), model.priors, cfg))[0]

    drawn = 0
    for cl in range(1, args.num_classes):
        for row in dets[cl]:
            score = row[0]
            if score < args.threshold:
                break
            px = np.clip(row[1:] * [w, h, w, h], -10_000, 10_000)
            x1, y1, x2, y2 = (int(v) for v in px)
            label = (VOC_CLASSES[cl - 1] if args.num_classes == 21
                     else f"cls{cl}")
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 2)
            cv2.putText(img, f"{label} {score:.2f}", (x1, max(y1 - 5, 10)),
                        cv2.FONT_HERSHEY_DUPLEX, 0.5, (0, 0, 255))
            drawn += 1
    cv2.imwrite(args.out, img)
    print(f"{drawn} detections >= {args.threshold} drawn -> {args.out}")


if __name__ == "__main__":
    main()
