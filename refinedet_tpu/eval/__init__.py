from refinedet_tpu.eval.coco_eval import COCOeval, Params, box_iou_xywh

__all__ = ["COCOeval", "Params", "box_iou_xywh"]
