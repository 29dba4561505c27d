"""Model / anchor / schedule configuration.

TPU-native re-design of the reference's config system
(``/root/reference/data/config.py:16-119`` plus the per-driver argparse and the
hard-coded dicts in ``/root/reference/models/refinedet.py:257-275``): one
declarative dataclass layer, with the reference's dict names (``voc_refinedet``,
``coco_refinedet``, ``MEANS``) mirrored for API parity.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence, Tuple

HOME = os.getcwd()
COCOroot = os.path.join(HOME, "data/SSDD/SSDD_coco")
VOC_ROOT = os.path.join(HOME, "data/VOCdevkit/")

# For drawing pretty bounding boxes (mirrors reference config.py:10-11).
COLORS = ((255, 0, 0, 128), (0, 255, 0, 128), (0, 0, 255, 128),
          (0, 255, 255, 128), (255, 0, 255, 128), (255, 255, 0, 128))

# Per-channel pixel mean. The reference (config.py:13) uses the SAR dataset
# mean for all channels; the VOC path historically used (104, 117, 123).
MEANS = (98.13131, 98.13131, 98.13131)
VOC_MEANS = (104, 117, 123)


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor-grid geometry for one input resolution.

    Field names mirror the reference's config-dict keys
    (``/root/reference/data/config.py:63-119``) so recipes translate 1:1.
    """

    num_classes: int
    feature_maps: Tuple[int, ...]
    min_dim: int
    steps: Tuple[int, ...]
    min_sizes: Tuple[int, ...]
    max_sizes: Tuple[int, ...]
    aspect_ratios: Tuple[Tuple[int, ...], ...]
    variance: Tuple[float, float] = (0.1, 0.2)
    clip: bool = True
    name: str = "RefineDet"
    # Training schedule (reference keys lr_steps / max_iter).
    lr_steps: Tuple[int, ...] = ()
    max_iter: int = 120000

    def __post_init__(self):
        for v in self.variance:
            if v <= 0:
                raise ValueError("Variances must be greater than 0")

    @property
    def num_priors_per_cell(self) -> Tuple[int, ...]:
        out = []
        for k in range(len(self.feature_maps)):
            n = 1  # aspect-ratio-1 box at min_size
            if self.max_sizes:
                n += 1  # geometric-mean box
            n += 2 * len(self.aspect_ratios[k])  # +/- sqrt(ar) pair per ratio
            out.append(n)
        return tuple(out)

    @property
    def num_priors(self) -> int:
        return sum(f * f * n
                   for f, n in zip(self.feature_maps, self.num_priors_per_cell))

    def asdict(self) -> dict:
        d = dataclasses.asdict(self)
        d["feature_maps"] = list(self.feature_maps)
        d["steps"] = list(self.steps)
        d["min_sizes"] = list(self.min_sizes)
        d["max_sizes"] = list(self.max_sizes)
        d["aspect_ratios"] = [list(a) for a in self.aspect_ratios]
        d["variance"] = list(self.variance)
        return d


def _refinedet_cfg(size: int, num_classes: int, name: str) -> AnchorConfig:
    # 896 is the five-source variant sketched (but left config-less) by the
    # reference's BN model (refinedet_bn.py:347-375): an extra conv3_3
    # source at stride 8 with the pyramid extended one level deeper.
    # 896 taps conv3_3 before pool3 -> stride-4 lead source; the min_size
    # progression keeps the reference's min_size = 4 * step rule.
    fm = {320: (40, 20, 10, 5), 512: (64, 32, 16, 8),
          896: (224, 112, 56, 28, 14)}[size]
    steps = (8, 16, 32, 64) if size != 896 else (4, 8, 16, 32, 64)
    min_sizes = ((32, 64, 128, 256) if size != 896
                 else (16, 32, 64, 128, 256))
    return AnchorConfig(
        num_classes=num_classes,
        feature_maps=fm,
        min_dim=size,
        steps=steps,
        min_sizes=min_sizes,
        max_sizes=(),
        aspect_ratios=tuple((2,) for _ in fm),
        variance=(0.1, 0.2),
        clip=True,
        name=name,
        lr_steps=(80000, 100000, 120000),
        max_iter=120000,
    )


# RefineDet configs, mirroring /root/reference/data/config.py:63-119.
voc_refinedet = {
    "320": _refinedet_cfg(320, 21, "RefineDet_VOC_320"),
    "512": _refinedet_cfg(512, 21, "RefineDet_VOC_512"),
    "896": _refinedet_cfg(896, 21, "RefineDet_VOC_896"),
}
coco_refinedet = {
    "320": _refinedet_cfg(320, 2, "RefineDet_COCO_320"),
    "512": _refinedet_cfg(512, 2, "RefineDet_COCO_512"),
    "896": _refinedet_cfg(896, 2, "RefineDet_COCO_896"),
}

# Plain-SSD configs (legacy paths, reference config.py:16-60).
voc_ssd = {
    "300": AnchorConfig(
        num_classes=21,
        feature_maps=(38, 19, 10, 5, 3, 1),
        min_dim=300,
        steps=(8, 16, 32, 64, 100, 300),
        min_sizes=(30, 60, 111, 162, 213, 264),
        max_sizes=(60, 111, 162, 213, 264, 315),
        aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
        name="VOC_300",
        lr_steps=(80000, 100000, 120000),
        max_iter=120000,
    ),
    "512": AnchorConfig(
        num_classes=21,
        feature_maps=(64, 32, 16, 8, 4, 2, 1),
        min_dim=512,
        steps=(8, 16, 32, 64, 128, 256, 512),
        min_sizes=(20, 51, 133, 215, 296, 378, 460),
        max_sizes=(51, 133, 215, 296, 378, 460, 542),
        aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2,), (2,)),
        name="VOC_512",
        lr_steps=(80000, 100000, 120000),
        max_iter=120000,
    ),
}
coco_ssd = AnchorConfig(
    num_classes=201,
    feature_maps=(38, 19, 10, 5, 3, 1),
    min_dim=300,
    steps=(8, 16, 32, 64, 100, 300),
    min_sizes=(21, 45, 99, 153, 207, 261),
    max_sizes=(45, 99, 153, 207, 261, 315),
    aspect_ratios=((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
    name="COCO",
    lr_steps=(280000, 360000, 400000),
    max_iter=400000,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-recipe knobs (mirrors train_refinedet.py argparse defaults)."""

    batch_size: int = 32
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    gamma: float = 0.1
    max_epoch: int = 300
    warmup_epochs: int = 5
    warmup_init_lr: float = 1e-6
    negpos_ratio: int = 3
    overlap_thresh: float = 0.5
    theta: float = 0.01  # ARM objectness filter for ODM positives
    max_boxes: int = 60  # static per-image GT padding
    grad_clip_norm: float = 0.0  # 0 = off (reference has no clipping)
    ema_decay: float = 0.0  # >0: keep an EMA of params (0 = off, like ref)
    on_device_augment: bool = False  # fuse SSD augmentation into the step
    mean: Tuple[float, float, float] = (104.0, 117.0, 123.0)
    num_workers: int = 8
    worker_processes: bool = False  # spawn-based workers (vs threads)
    seed: int = 0
    dtype: str = "float32"  # compute dtype for the model ("bfloat16" on TPU)
    spatial_shards: int = 1  # >1: shard image H over a 'space' mesh axis


@dataclasses.dataclass(frozen=True)
class DetectConfig:
    """Post-processing knobs (mirrors eval_refinedet_coco.py:288-309)."""

    num_classes: int = 2
    top_k: int = 1000
    keep_top_k: int = 500
    conf_thresh: float = 0.01
    nms_thresh: float = 0.49
    objectness_thresh: float = 0.01
    variance: Tuple[float, float] = (0.1, 0.2)

    def __post_init__(self):
        if self.nms_thresh <= 0:
            raise ValueError("nms_threshold must be non negative.")
