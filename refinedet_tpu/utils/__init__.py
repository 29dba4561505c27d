from refinedet_tpu.utils.logger import Logger, install, mkdir_if_missing
from refinedet_tpu.utils.timer import Timer, profile_trace, step_annotation
from refinedet_tpu.utils.plot import parse_log, plot_loss, plot_map

__all__ = ["Logger", "install", "mkdir_if_missing", "Timer",
           "profile_trace", "step_annotation", "parse_log", "plot_loss",
           "plot_map"]
