from refinedet_tpu.detect.detection import (Detect_RefineDet, cascade_decode,
                                            detect_refinedet,
                                            detect_refinedet_nms, detect_ssd,
                                            filter_objectness)

__all__ = ["Detect_RefineDet", "cascade_decode", "detect_refinedet",
           "detect_refinedet_nms", "detect_ssd", "filter_objectness"]
