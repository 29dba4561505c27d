from refinedet_tpu.models.builder import (RefineDetModel, build_refinedet,
                                          build_refinedet_bn)
from refinedet_tpu.models.layers import L2Norm
from refinedet_tpu.models.refinedet import RefineDet, expected_num_priors

__all__ = ["RefineDetModel", "build_refinedet", "build_refinedet_bn",
           "L2Norm", "RefineDet", "expected_num_priors"]
