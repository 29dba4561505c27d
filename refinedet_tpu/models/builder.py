"""Model construction + phase wrapper (API parity with build_refinedet).

Mirrors ``/root/reference/models/refinedet.py:278-291`` (build_refinedet) and
the phase behavior of RefineDet.forward (:139-157): 'train' returns the raw
head tuple + priors; 'test' applies softmax to both conf heads and runs the
detector. The heavy lifting is jitted end-to-end — backbone, heads, softmax
and cascade decode compile into one XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from refinedet_tpu.boxes.priors import generate_priors
from refinedet_tpu.config import (AnchorConfig, coco_refinedet, voc_refinedet)
from refinedet_tpu.detect.detection import Detect_RefineDet, detect_refinedet
from refinedet_tpu.models.refinedet import RefineDet


def anchor_config_for(size: int, num_classes: int) -> AnchorConfig:
    """Reference rule (refinedet.py:32): VOC anchor table iff
    num_classes == 21, else the coco_refinedet table — but with
    ``num_classes`` set to the requested count, so ``model.cfg`` never
    contradicts the model (the stock coco table is frozen at 2 for the
    reference's 1-class SSDD setup)."""
    import dataclasses
    table = voc_refinedet if num_classes == 21 else coco_refinedet
    cfg = table[str(size)]
    if cfg.num_classes != num_classes:
        cfg = dataclasses.replace(cfg, num_classes=num_classes)
    return cfg


class RefineDetModel:
    """Bundles the Flax module, its priors, and the phase semantics.

    Usage:
      model = build_refinedet('train', 320, 21)
      params = model.init(rng)
      out = model.apply(params, images)   # phase-dependent output
    """

    def __init__(self, phase: str, size: int, num_classes: int,
                 detector: Optional[Detect_RefineDet] = None,
                 use_bn: bool = False, dtype: Any = jnp.float32,
                 quant: bool = False, quant_skip: tuple = (),
                 stem_s2d: bool = False):
        if phase not in ("train", "test"):
            raise ValueError(f"phase must be 'train' or 'test', got {phase!r}")
        if size not in (320, 512, 896):
            raise ValueError(
                "supported sizes: 320, 512 (reference) and 896 "
                "(five-source variant)")
        if quant and phase != "test":
            raise ValueError("int8 quantization is an inference-only "
                             "serving mode; use phase='test'")
        self.phase = phase
        self.size = size
        self.num_classes = num_classes
        self.use_bn = use_bn
        self.quant = quant
        self.cfg = anchor_config_for(size, num_classes)
        self.quant_skip = tuple(quant_skip)
        if stem_s2d and phase != "test":
            raise ValueError("stem_s2d is an inference-only serving "
                             "transform; use phase='test'")
        self.stem_s2d = stem_s2d
        self.module = RefineDet(size=size, num_classes=num_classes,
                                use_bn=use_bn, dtype=dtype, quant=quant,
                                quant_skip=tuple(quant_skip),
                                stem_s2d=stem_s2d)
        self.priors = jnp.asarray(generate_priors(self.cfg))
        self.detect = detector

    # -- parameter init -----------------------------------------------------
    def init(self, rng: jax.Array, batch_size: int = 1):
        dummy = jnp.zeros((batch_size, self.size, self.size, 3), jnp.float32)
        variables = self.module.init(rng, dummy, train=False)
        # flax init makes every collection mutable, so the PTQ calibration
        # sows (refinedet.py:conv_with_calibration) deposit ~21M zeros of
        # 'calib'/'calib_x' placeholders. They are pure apply-time scratch —
        # calibrate_amax / gptq re-create them via mutable=['calib'...] —
        # so drop them from the canonical variables tree.
        return {k: v for k, v in variables.items()
                if k not in ("calib", "calib_x")}

    # -- forward ------------------------------------------------------------
    def raw_forward(self, variables, images, train: bool = False,
                    mutable=False):
        """Raw head outputs (arm_loc, arm_conf, odm_loc, odm_conf)."""
        return self.module.apply(variables, images, train=train,
                                 mutable=mutable)

    def apply(self, variables, images):
        """Phase-dependent forward, mirroring RefineDet.forward."""
        heads = self.module.apply(variables, images, train=False)
        arm_loc, arm_conf, odm_loc, odm_conf = heads
        if self.phase == "train":
            return (*heads, self.priors)
        arm_probs = jax.nn.softmax(arm_conf, axis=-1)
        odm_probs = jax.nn.softmax(odm_conf, axis=-1)
        if self.detect is not None:
            return self.detect.forward(arm_loc, arm_probs, odm_loc,
                                       odm_probs, self.priors)
        return detect_refinedet(arm_loc, arm_probs, odm_loc, odm_probs,
                                self.priors)

    def jit_apply(self):
        """Jitted phase forward (donates nothing; params are an arg)."""
        return jax.jit(self.apply)

    def __call__(self, variables, images):
        return self.apply(variables, images)


def build_refinedet(phase: str, size: int = 320, num_classes: int = 21,
                    detector: Optional[Detect_RefineDet] = None,
                    use_bn: bool = False, dtype: Any = jnp.float32,
                    quant: bool = False,
                    quant_skip: tuple = (),
                    stem_s2d: bool = False) -> RefineDetModel:
    """API-parity builder (refinedet.py:278-291).

    ``quant=True`` builds the int8 serving twin (QuantConv trunk/TCB);
    fill its variables with refinedet_tpu.quant.quantize_model.
    ``quant_skip`` keeps the named convs unquantized.
    ``stem_s2d`` builds the space-to-depth-stem serving twin; fill its
    variables with models.stem_s2d.fold_stem_variables.
    """
    return RefineDetModel(phase, size, num_classes, detector=detector,
                          use_bn=use_bn, dtype=dtype, quant=quant,
                          quant_skip=quant_skip, stem_s2d=stem_s2d)


def build_refinedet_bn(phase: str, size: int = 320, num_classes: int = 21,
                       detector: Optional[Detect_RefineDet] = None,
                       dtype: Any = jnp.float32) -> RefineDetModel:
    """BN variant builder (refinedet_bn.py:377-387)."""
    return RefineDetModel(phase, size, num_classes, detector=detector,
                          use_bn=True, dtype=dtype)
