from refinedet_tpu.boxes.geometry import (area, center_size, intersect,
                                          iou_pairwise, jaccard, point_form)
from refinedet_tpu.boxes.codec import decode, encode
from refinedet_tpu.boxes.matcher import (MatchResult, match, match_batch,
                                         refine_match, refine_match_batch)
from refinedet_tpu.boxes.priors import PriorBox, generate_priors

__all__ = [
    "area", "center_size", "intersect", "iou_pairwise", "jaccard",
    "point_form", "decode", "encode", "MatchResult", "match", "match_batch",
    "refine_match", "refine_match_batch", "PriorBox", "generate_priors",
]
