"""AOT export: package trained RefineDet inference as one serialized file.

The reference's deployment story is "ship the .pth and re-instantiate the
Python model around it" (demo/demo.ipynb cells 3-11, eval drivers'
build+load). The TPU-native story can do better: ``jax.export`` lowers the
whole jitted inference function — backbone, heads, softmax, objectness
filter, cascade decode (the live Detect_RefineDet path,
``/root/reference/layers/functions/detection_refinedet.py:27-65``) — to a
self-contained StableHLO artifact with the weights baked in as constants.
The serving host needs jax + this file: no model code, no checkpoint
format, no Python class versioning. One artifact serves any batch size
(symbolic batch dim) on any exported platform (TPU and CPU by default).

File format: ``MAGIC | u32 json_len | json metadata | StableHLO payload``
— a single flat file, streamable, with human-readable provenance up front.

Used by tools/export_serving.py (CLI) and pinned against the live model in
tests/test_serving_export.py.
"""

from __future__ import annotations

import functools
import json
import struct
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"RDTPUSRV1\n"
_DEFAULT_PLATFORMS = ("tpu", "cpu")


def export_inference(model, variables: Mapping,
                     batch_size: Optional[int] = None,
                     platforms: Sequence[str] = _DEFAULT_PLATFORMS,
                     fused_nms: Optional[Mapping] = None,
                     uint8_input: bool = False,
                     input_mean: Optional[Sequence[float]] = None,
                     ) -> jax.export.Exported:
    """Export ``model.apply(variables, images)`` with the weights baked in.

    ``model`` is a RefineDetModel in 'test' phase. ``batch_size=None``
    exports a symbolic batch dimension — one artifact serves any batch.
    ``platforms`` lists the backends the artifact may run on; lowering is
    cross-platform (the artifact for TPU can be produced on a CPU host).

    ``uint8_input`` moves the mean-subtract INTO the artifact: the wire
    carries raw uint8 RGB pixels (4x less host->device upload than the
    default mean-subtracted f32 — the measured bottleneck of the serving
    engine leg, ~39 MB per 32-batch at 320 through this box's tunnel) and
    the artifact's first op is an on-device ``f32(x) - mean``. Exact for
    integer pixels: uint8 values and the means are exactly representable
    in f32, so the subtraction matches the host-side BaseTransform
    bit-for-bit (the same staging trick as data/augment_jax.py's
    StagingTransform). ``input_mean`` is the per-channel mean in the
    reference's BGR config convention (config MEANS /
    ``/root/reference/data/config.py:13``, default (104, 117, 123));
    since the wire is RGB it is reversed before subtraction, matching
    BaseTransform's subtract-in-BGR-then-flip order.

    ``fused_nms`` bakes the Evaluator's full post-processing into the
    artifact (decode + per-class NMS + compaction,
    eval/evaluator.py:_forward_postprocess): the output becomes
    ``dets [B, C-1, K, 5]`` rows (x1, y1, x2, y2, score), normalized
    0-1 coordinates, score-descending, zero-padded — ~100x less
    device->host transfer than the raw (boxes, scores) pair. Keys (all
    optional): nms_thresh, conf_thresh, objectness_thresh, variance,
    nms_top_k, plus_one — defaults matching DetectConfig / Evaluator
    (plus_one only accepts False: the +1 area convention is pixel-space,
    and the artifact's boxes are normalized).

    NMS backend is pinned at export time, not runtime-dispatched: a
    TPU-ONLY artifact (``platforms=('tpu',)``) embeds the Pallas VMEM
    suppression-sweep kernel (ops/nms_pallas.py); any cross-platform or
    CPU artifact embeds the portable XLA formulation (ops/nms.py), which
    the TPU compiler takes minutes to build and runs slower — export
    TPU-only artifacts for TPU serving.
    """
    if model.phase != "test":
        raise ValueError("serving export requires a 'test'-phase model")
    if input_mean is not None and not uint8_input:
        raise ValueError("input_mean only applies with uint8_input=True "
                         "(the f32 wire is already mean-subtracted)")
    frozen = jax.tree.map(jnp.asarray, dict(variables))

    if fused_nms is None:
        def fn(images):
            return model.apply(frozen, images)
    else:
        from refinedet_tpu.config import DetectConfig
        from refinedet_tpu.detect.detection import detect_refinedet
        from refinedet_tpu.ops.dispatch import class_parallel_nms

        known = {"nms_thresh", "conf_thresh", "objectness_thresh",
                 "variance", "nms_top_k", "plus_one"}
        unknown = set(fused_nms) - known
        if unknown:
            raise ValueError(f"fused_nms: unknown keys {sorted(unknown)}; "
                             f"known: {sorted(known)}")
        dc = DetectConfig(num_classes=model.num_classes)
        nms_thresh = float(fused_nms.get("nms_thresh", dc.nms_thresh))
        conf_thresh = float(fused_nms.get("conf_thresh", dc.conf_thresh))
        obj_thresh = float(fused_nms.get("objectness_thresh",
                                         dc.objectness_thresh))
        variance = tuple(fused_nms.get("variance", dc.variance))
        nms_top_k = int(fused_nms.get("nms_top_k", 200))
        plus_one = bool(fused_nms.get("plus_one", False))
        if plus_one:
            # The +1 area convention (reference cpu_nms.pyx:17-68) is a
            # PIXEL-space quirk; the artifact's boxes are normalized 0-1,
            # where +1 would swamp every area and pass all IoU tests.
            # The evaluator applies it after scaling to pixels — a fused
            # artifact has no image scales, so it cannot.
            raise ValueError(
                "fused_nms: plus_one=True is pixel-space semantics; the "
                "artifact runs NMS on normalized 0-1 boxes (scale-invariant "
                "only without +1). Use plus_one=False (default).")
        # Pin the NMS implementation to the artifact's platform set —
        # the runtime dispatch (ops/dispatch.py) cannot live inside a
        # cross-platform artifact.
        nms_backend = "tpu" if tuple(platforms) == ("tpu",) else "cpu"

        def fn(images):
            heads = model.raw_forward(frozen, images)
            arm_loc, arm_conf, odm_loc, odm_conf = heads
            arm_p = jax.nn.softmax(arm_conf, axis=-1)
            odm_p = jax.nn.softmax(odm_conf, axis=-1)
            boxes, scores = detect_refinedet(
                arm_loc, arm_p, odm_loc, odm_p, model.priors,
                variances=variance, objectness_thresh=obj_thresh)
            cls_scores = jnp.moveaxis(scores[..., 1:], -1, 1)
            nms = functools.partial(
                class_parallel_nms, iou_thresh=nms_thresh,
                top_k=nms_top_k, score_thresh=conf_thresh,
                plus_one=plus_one, backend=nms_backend)
            if nms_backend == "tpu" and not isinstance(boxes.shape[0],
                                                       int):
                # Symbolic-batch artifact: the Pallas sweep's grid and
                # SMEM count block scale with batch*classes, and Pallas
                # rejects dynamically-shaped blocks. Scan over the batch
                # so every kernel call sees the static [C-1] group grid
                # (NMS is a sub-1% slice of inference; the lost
                # cross-image grid pipelining is noise).
                bx, sc = jax.lax.map(
                    lambda t: nms(t[0][None], t[1]), (boxes, cls_scores))
            else:
                bx, sc = nms(boxes[:, None], cls_scores)
            return jnp.concatenate([bx, sc[..., None]], axis=-1)

    if uint8_input:
        mean_bgr = tuple(float(m) for m in
                         (input_mean if input_mean is not None
                          else (104.0, 117.0, 123.0)))
        if len(mean_bgr) != 3:
            raise ValueError(f"input_mean needs 3 channels, got {mean_bgr}")
        mean_rgb = jnp.asarray(mean_bgr[::-1], jnp.float32)
        infer = fn

        def fn(raw):
            return infer(raw.astype(jnp.float32) - mean_rgb)

    if batch_size is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, model.size, model.size, 3),
                                jnp.uint8 if uint8_input else jnp.float32)
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(spec)


def _metadata(model, batch_size, exported, fused_nms=None,
              uint8_input=False, input_mean=None) -> Dict[str, Any]:
    if fused_nms is None:
        output = ("(boxes[b,N,4], scores[b,N,C]) raw Detect_RefineDet "
                  "path unless a fused-NMS detector was attached")
    else:
        output = ("dets[b, C-1, K, 5] (x1, y1, x2, y2, score), normalized "
                  "0-1 coords, per-class NMS'd, score-descending, "
                  "zero-padded")
    if uint8_input:
        mean_bgr = [float(m) for m in (input_mean if input_mean is not None
                                       else (104.0, 117.0, 123.0))]
        inp = ("NHWC uint8, raw RGB pixels; the artifact subtracts "
               f"input_mean_bgr (reversed to RGB) on device")
    else:
        mean_bgr = None
        inp = "NHWC float32, mean-subtracted RGB (BaseTransform)"
    return {
        "format": "refinedet-tpu-serving",
        "input_size": model.size,
        "num_classes": model.num_classes,
        "batch_size": batch_size,  # None = symbolic (any batch)
        "use_bn": model.use_bn,
        "int8": bool(model.quant),
        "platforms": list(exported.platforms),
        "fused_nms": dict(fused_nms) if fused_nms is not None else None,
        "input_dtype": "uint8" if uint8_input else "float32",
        "input_mean_bgr": mean_bgr,
        "input": inp,
        "output": output,
        "jax_version": jax.__version__,
    }


def save_serving(model, variables: Mapping, path: str,
                 batch_size: Optional[int] = None,
                 platforms: Sequence[str] = _DEFAULT_PLATFORMS,
                 fused_nms: Optional[Mapping] = None,
                 uint8_input: bool = False,
                 input_mean: Optional[Sequence[float]] = None) -> dict:
    """Export + write a serving artifact; returns its metadata dict."""
    exported = export_inference(model, variables, batch_size=batch_size,
                                platforms=platforms, fused_nms=fused_nms,
                                uint8_input=uint8_input,
                                input_mean=input_mean)
    meta = _metadata(model, batch_size, exported, fused_nms=fused_nms,
                     uint8_input=uint8_input, input_mean=input_mean)
    blob = bytes(exported.serialize())
    header = json.dumps(meta, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    return meta


class ServingModel:
    """A deserialized artifact: ``serving(images) -> model outputs``."""

    def __init__(self, meta: Dict[str, Any], exported: jax.export.Exported):
        self.meta = meta
        self.exported = exported
        self.input_dtype = np.dtype(meta.get("input_dtype", "float32"))
        self._call = jax.jit(exported.call)

    def __call__(self, images) -> Any:
        images = jnp.asarray(images, self.input_dtype)
        want = self.meta["batch_size"]
        if want is not None and images.shape[0] != want:
            raise ValueError(
                f"artifact was exported for batch {want}, "
                f"got {images.shape[0]} (re-export with batch_size=None "
                "for a symbolic batch)")
        return self._call(images)


def load_serving(path: str) -> ServingModel:
    """Load an artifact written by save_serving. Requires only jax —
    no model classes, checkpoints, or framework config."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not a refinedet-tpu serving "
                             f"artifact (magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    return ServingModel(meta, exported)
