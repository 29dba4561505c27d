from refinedet_tpu.models.builder import (RefineDetModel, build_refinedet,
                                          build_refinedet_bn)
from refinedet_tpu.models.layers import L2Norm
from refinedet_tpu.models.refinedet import RefineDet, expected_num_priors
from refinedet_tpu.models.stem_s2d import (fold_stem_params,
                                           fold_stem_variables)

__all__ = ["RefineDetModel", "build_refinedet", "build_refinedet_bn",
           "L2Norm", "RefineDet", "expected_num_priors",
           "fold_stem_params", "fold_stem_variables"]
