from refinedet_tpu.data.augmentations import (BaseTransform, SSDAugmentation)
from refinedet_tpu.data.collate import Batch, detection_collate, pad_targets
from refinedet_tpu.data.coco_io import COCO
from refinedet_tpu.data.loader import DataLoader
from refinedet_tpu.data.sarship import COCODetection
from refinedet_tpu.data.voc import (VOC_CLASSES, VOCAnnotationTransform,
                                    VOCDetection)

__all__ = ["BaseTransform", "SSDAugmentation", "Batch", "detection_collate",
           "pad_targets", "COCO", "DataLoader", "COCODetection",
           "VOC_CLASSES", "VOCAnnotationTransform", "VOCDetection"]
