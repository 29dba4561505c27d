"""Deployment: ahead-of-time compiled, serialized serving artifacts."""

from refinedet_tpu.serve.export import (ServingModel, export_inference,
                                        load_serving, save_serving)

__all__ = ["ServingModel", "export_inference", "load_serving",
           "save_serving"]
