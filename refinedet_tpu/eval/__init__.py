from refinedet_tpu.eval.coco_eval import COCOeval, Params, box_iou_xywh
from refinedet_tpu.eval.evaluator import Evaluator
from refinedet_tpu.eval.voc_eval import (evaluate_voc, voc_ap,
                                         voc_eval_class,
                                         write_voc_results_files)

__all__ = ["COCOeval", "Params", "box_iou_xywh", "Evaluator",
           "evaluate_voc", "voc_ap", "voc_eval_class",
           "write_voc_results_files"]
