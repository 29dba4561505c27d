from refinedet_tpu.ops.nms import NmsResult, batched_nms, nms, soft_nms
from refinedet_tpu.ops.dispatch import batched_nms_auto, class_parallel_nms
from refinedet_tpu.ops.nms_pallas import nms_pallas, nms_sweep_pallas
from refinedet_tpu.ops import nms_native

__all__ = ["NmsResult", "batched_nms", "nms", "soft_nms",
           "batched_nms_auto", "class_parallel_nms", "nms_pallas",
           "nms_sweep_pallas", "nms_native"]
