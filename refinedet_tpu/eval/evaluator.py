"""Batched detection evaluator (inference + on-device NMS + AP).

Counterpart of the reference eval drivers' ``test_net`` loops
(``/root/reference/eval_refinedet_coco.py:155-269``,
``eval_refinedet_voc.py:366-415``), redesigned TPU-first: instead of
one-image-at-a-time forward + host numpy NMS, images run in fixed-size
batches through one jitted program that fuses the forward pass, softmax,
cascade decode, pixel scaling, and class-parallel NMS (+1 area convention,
matching the reference's C/CUDA ``nms_wrapper`` path at
eval_refinedet_coco.py:213-232). Only the final compacted detections cross
back to the host.

Also provides the checkpoint-sweep loop + ap_stats.json + best-epoch report
(eval_refinedet_coco.py:328-368) and FPS/p50 timing (the reference prints
FPS at :261; BASELINE.json asks for p50 as well).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from refinedet_tpu.config import DetectConfig
from refinedet_tpu.detect.detection import detect_refinedet
from refinedet_tpu.ops.dispatch import class_parallel_nms


class Evaluator:
    def __init__(self, model, dataset, detect_cfg: DetectConfig,
                 transform, batch_size: int = 8,
                 nms_top_k: Optional[int] = None,
                 max_per_image: int = 500, plus_one: bool = True,
                 mesh=None,
                 log: Callable[[str], None] = print):
        """``mesh``: optional jax.sharding.Mesh — images shard over the
        'data' axis for multi-chip batched evaluation (params replicated),
        the eval-side mirror of the training DP layout.

        ``nms_top_k`` is the per-class pre-NMS candidate cap; it defaults
        to ``detect_cfg.top_k`` (1000, the reference's order[:top_k] cap
        at eval_refinedet_coco.py:222) — pass a smaller value to trade
        recall for NMS speed."""
        self.model = model
        self.dataset = dataset
        self.cfg = detect_cfg
        self.transform = transform
        self.batch_size = batch_size
        self.nms_top_k = nms_top_k if nms_top_k else detect_cfg.top_k
        self.max_per_image = max_per_image
        self.plus_one = plus_one
        self.log = log
        self.num_classes = detect_cfg.num_classes
        if mesh is None:
            self._fn = jax.jit(self._forward_postprocess)
        else:
            from refinedet_tpu.parallel.mesh import (batch_sharding,
                                                     replicated_sharding)
            data = batch_sharding(mesh)
            repl = replicated_sharding(mesh)
            if batch_size % mesh.devices.size:
                raise ValueError("batch_size must divide the mesh size")
            self._fn = jax.jit(self._forward_postprocess,
                               in_shardings=(repl, data, data),
                               out_shardings=data)

    def _forward_postprocess(self, variables, images, scales):
        """images [B,S,S,3], scales [B,4] (w,h,w,h) -> dets
        [B, C-1, K, 5] rows (x1, y1, x2, y2, score) in pixels,
        score-descending, zero-padded."""
        heads = self.model.raw_forward(variables, images)
        arm_loc, arm_conf, odm_loc, odm_conf = heads
        arm_p = jax.nn.softmax(arm_conf, axis=-1)
        odm_p = jax.nn.softmax(odm_conf, axis=-1)
        boxes, scores = detect_refinedet(
            arm_loc, arm_p, odm_loc, odm_p, self.model.priors,
            variances=self.cfg.variance,
            objectness_thresh=self.cfg.objectness_thresh)
        boxes = boxes * scales[:, None, :]
        cls_scores = jnp.moveaxis(scores[..., 1:], -1, 1)  # [B, C-1, P]
        bx, sc = class_parallel_nms(
            boxes[:, None], cls_scores, self.cfg.nms_thresh,
            top_k=self.nms_top_k, score_thresh=self.cfg.conf_thresh,
            plus_one=self.plus_one)
        return jnp.concatenate([bx, sc[..., None]], axis=-1)

    def _staged_batches(self, n: int):
        """Host preprocessing, prefetched one batch ahead of the device."""
        import queue
        import threading
        size = self.model.size
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # Bounded put polling the stop flag so an abandoned iteration
            # (exception in the consumer) can't strand this thread on a
            # full queue.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for b0 in range(0, n, self.batch_size):
                    if stop.is_set():
                        return
                    idx = list(range(b0, min(b0 + self.batch_size, n)))
                    imgs = np.zeros((self.batch_size, size, size, 3),
                                    np.float32)
                    scales = np.ones((self.batch_size, 4), np.float32)
                    for j, i in enumerate(idx):
                        raw = self.dataset.pull_image(i)
                        raw = raw[0] if isinstance(raw, tuple) else raw
                        imgs[j] = self.transform(raw)
                        h, w = raw.shape[:2]
                        scales[j] = (w, h, w, h)
                    if not put_or_stop((idx, imgs, scales)):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                put_or_stop(e)
                return
            put_or_stop(None)

        threading.Thread(target=produce, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    # A corrupt/missing image must fail the sweep loudly,
                    # not hang it on an empty queue.
                    raise item
                yield item
        finally:
            stop.set()

    def run(self, variables) -> List[List[np.ndarray]]:
        """Returns all_boxes[class][image] = [N, 5] (x1,y1,x2,y2,score)."""
        n = len(self.dataset)
        c = self.num_classes
        all_boxes: List[List[np.ndarray]] = [
            [np.empty((0, 5), np.float32) for _ in range(n)]
            for _ in range(c)]
        batch_times = []
        t_start = time.time()
        for idx, imgs, scales in self._staged_batches(n):
            t0 = time.time()
            dets = self._fn(variables, jnp.asarray(imgs),
                            jnp.asarray(scales))
            dets = np.asarray(jax.device_get(dets))
            batch_times.append(time.time() - t0)
            for j, i in enumerate(idx):
                for cl in range(1, c):
                    rows = dets[j, cl - 1]
                    rows = rows[rows[:, 4] > 0][:self.max_per_image]
                    all_boxes[cl][i] = rows.astype(np.float32)
        total = time.time() - t_start
        # skip the compile batch for steady-state numbers
        steady = batch_times[1:] or batch_times
        per_img = float(np.median(steady)) / self.batch_size
        self.log(f"\nFPS: {1.0 / per_img:.2f} "
                 f"(p50 batch latency {np.median(steady) * 1000:.1f} ms @ "
                 f"batch {self.batch_size}; total {total:.1f}s for {n} imgs)")
        self.timing = {"fps": 1.0 / per_img,
                       "p50_batch_ms": float(np.median(steady) * 1000),
                       "batch_size": self.batch_size}
        return all_boxes

    # -- checkpoint sweep (eval_refinedet_coco.py:328-368 parity) ----------
    def sweep(self, checkpoints: Sequence, load_fn: Callable,
              epochs: Optional[Sequence[int]] = None,
              save_folder: Optional[str] = None) -> Dict[str, list]:
        """Evaluate a series of checkpoints; returns + dumps ap_stats."""
        ap_stats = {k: [] for k in ("ap", "ap50", "ap75", "ap_small",
                                    "ap_medium", "ap_large", "epoch")}
        for i, ckpt in enumerate(checkpoints):
            variables = load_fn(ckpt)
            epoch = epochs[i] if epochs else i
            self.log(f"evaluating epoch: {epoch}")
            all_boxes = self.run(variables)
            stats = self.dataset.evaluate_detections(all_boxes, save_folder)
            for key, val in zip(("ap", "ap50", "ap75", "ap_small",
                                 "ap_medium", "ap_large"), stats[:6]):
                ap_stats[key].append(float(val))
            ap_stats["epoch"].append(epoch)
        if save_folder:
            os.makedirs(save_folder, exist_ok=True)
            with open(osp.join(save_folder, "ap_stats.json"), "w") as f:
                json.dump(ap_stats, f)
        if ap_stats["ap"]:
            best = int(np.argmax(ap_stats["ap"]))
            best50 = int(np.argmax(ap_stats["ap50"]))
            self.log(
                f"best ap: {ap_stats['ap'][best]:.4f} @ epoch "
                f"{ap_stats['epoch'][best]}; best ap50: "
                f"{ap_stats['ap50'][best50]:.4f} @ epoch "
                f"{ap_stats['epoch'][best50]}")
        return ap_stats
