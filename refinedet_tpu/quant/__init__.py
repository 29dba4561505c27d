from refinedet_tpu.quant.gptq import (accumulate_hessians, conv_geometry,
                                      gptq_round)
from refinedet_tpu.quant.ptq import (DEFAULT_QUANT_SKIP,
                                     bias_correction_delta,
                                     calib_batches_from_dataset,
                                     calibrate_amax, quantize_model,
                                     quantize_variables)

__all__ = ["DEFAULT_QUANT_SKIP", "bias_correction_delta",
           "calib_batches_from_dataset", "calibrate_amax",
           "quantize_model", "quantize_variables",
           "accumulate_hessians", "conv_geometry", "gptq_round"]
