from refinedet_tpu.ops.nms import NmsResult, batched_nms, nms, soft_nms

__all__ = ["NmsResult", "batched_nms", "nms", "soft_nms"]
