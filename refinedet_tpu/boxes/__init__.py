from refinedet_tpu.boxes.geometry import (area, center_size, intersect,
                                          iou_pairwise, jaccard,
                                          log_sum_exp, point_form)
from refinedet_tpu.boxes.codec import decode, encode
from refinedet_tpu.boxes.matcher import (MatchResult, match, match_batch,
                                         refine_match, refine_match_batch)
from refinedet_tpu.boxes.priors import PriorBox, generate_priors

def __getattr__(name):
    # Greedy NMS over point-form boxes lives in ops (box_utils.py:222-286
    # counterpart is ops.nms with plus_one=False); re-exported lazily for
    # parity without creating an import cycle (ops.nms uses boxes.geometry).
    if name == "nms":
        from refinedet_tpu.ops.nms import nms
        return nms
    raise AttributeError(name)


__all__ = [
    "area", "center_size", "intersect", "iou_pairwise", "jaccard",
    "log_sum_exp", "point_form", "decode", "encode", "MatchResult",
    "match", "match_batch", "refine_match", "refine_match_batch",
    "PriorBox", "generate_priors", "nms",
]
