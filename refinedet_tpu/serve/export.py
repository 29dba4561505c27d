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
                     ) -> jax.export.Exported:
    """Export ``model.apply(variables, images)`` with the weights baked in.

    ``model`` is a RefineDetModel in 'test' phase. ``batch_size=None``
    exports a symbolic batch dimension — one artifact serves any batch.
    ``platforms`` lists the backends the artifact may run on; lowering is
    cross-platform (the artifact for TPU can be produced on a CPU host).

    Note: with a fused-NMS detector attached, the NMS implementation baked
    in is the portable XLA formulation chosen at trace time — the Pallas
    TPU kernel is a runtime dispatch and is not embedded in a
    cross-platform artifact.
    """
    if model.phase != "test":
        raise ValueError("serving export requires a 'test'-phase model")
    frozen = jax.tree.map(jnp.asarray, dict(variables))

    def fn(images):
        return model.apply(frozen, images)

    if batch_size is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, model.size, model.size, 3), jnp.float32)
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(spec)


def _metadata(model, batch_size, exported) -> Dict[str, Any]:
    return {
        "format": "refinedet-tpu-serving",
        "input_size": model.size,
        "num_classes": model.num_classes,
        "batch_size": batch_size,  # None = symbolic (any batch)
        "use_bn": model.use_bn,
        "int8": bool(model.quant),
        "platforms": list(exported.platforms),
        "input": "NHWC float32, mean-subtracted RGB (BaseTransform)",
        "output": ("(boxes[b,N,4], scores[b,N,C]) raw Detect_RefineDet "
                   "path unless a fused-NMS detector was attached"),
        "jax_version": jax.__version__,
    }


def save_serving(model, variables: Mapping, path: str,
                 batch_size: Optional[int] = None,
                 platforms: Sequence[str] = _DEFAULT_PLATFORMS) -> dict:
    """Export + write a serving artifact; returns its metadata dict."""
    exported = export_inference(model, variables, batch_size=batch_size,
                                platforms=platforms)
    meta = _metadata(model, batch_size, exported)
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
        self._call = jax.jit(exported.call)

    def __call__(self, images) -> Any:
        images = jnp.asarray(images, jnp.float32)
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
