#!/usr/bin/env python
"""Live webcam demo with FPS counter.

Counterpart of the reference's ``demo/live.py:20-66`` (whose import of
``ssd.build_ssd`` is stale there); this version drives the jitted RefineDet
inference per frame. Requires a camera — exits with a message if none.

Usage: python demo/live.py --trained_model ckpt [--camera 0]
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2  # noqa: E402

from refinedet_tpu import config as C  # noqa: E402
from refinedet_tpu.data import BaseTransform  # noqa: E402
from refinedet_tpu.data.voc import VOC_CLASSES  # noqa: E402
from refinedet_tpu.models import build_refinedet  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description="RefineDet live demo")
    p.add_argument("--trained_model", default=None)
    p.add_argument("--input_size", default="320", choices=["320", "512"])
    p.add_argument("--num_classes", default=21, type=int)
    p.add_argument("--threshold", default=0.35, type=float)
    p.add_argument("--camera", default=0, type=int)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    args = parse_args()
    size = int(args.input_size)
    model = build_refinedet("test", size, args.num_classes)
    if args.trained_model:
        from eval_refinedet_coco import make_loader
        variables = make_loader(model)(args.trained_model)
    else:
        variables = model.init(jax.random.PRNGKey(0))

    from refinedet_tpu.config import DetectConfig
    from refinedet_tpu.detect import detect_refinedet_nms

    cfg = DetectConfig(num_classes=args.num_classes, top_k=200,
                       keep_top_k=200, conf_thresh=0.01, nms_thresh=0.45)

    @jax.jit
    def fn(variables, x):
        # Full detect path incl. per-class NMS ([1, C, K, 5] rows of
        # (score, x1, y1, x2, y2)) — drawing raw per-prior scores would
        # cover the frame in duplicate boxes.
        arm_loc, arm_conf, odm_loc, odm_conf = model.raw_forward(
            variables, x)
        return detect_refinedet_nms(
            arm_loc, jax.nn.softmax(arm_conf, -1), odm_loc,
            jax.nn.softmax(odm_conf, -1), model.priors, cfg)

    transform = BaseTransform(size, C.VOC_MEANS)

    cap = cv2.VideoCapture(args.camera)
    if not cap.isOpened():
        print(f"no camera at index {args.camera}; exiting")
        return

    fps, t_last = 0.0, time.time()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        h, w = frame.shape[:2]
        dets = np.asarray(fn(variables,
                             jnp.asarray(transform(frame)[None])))[0]
        for cl in range(1, args.num_classes):
            for row in dets[cl]:
                if row[0] < args.threshold:
                    break  # rows are score-descending, zero-padded
                px = np.clip(row[1:] * [w, h, w, h], -10_000, 10_000)
                x1, y1, x2, y2 = (int(v) for v in px)
                cv2.rectangle(frame, (x1, y1), (x2, y2), (0, 0, 255), 2)
                cv2.putText(frame, VOC_CLASSES[cl - 1], (x1, y1),
                            cv2.FONT_HERSHEY_DUPLEX, 0.5, (0, 0, 255))
        now = time.time()
        fps = 0.9 * fps + 0.1 / max(now - t_last, 1e-6)
        t_last = now
        cv2.putText(frame, f"FPS {fps:.1f}", (10, 20),
                    cv2.FONT_HERSHEY_DUPLEX, 0.6, (0, 255, 0))
        cv2.imshow("refinedet_tpu live", frame)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cap.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
