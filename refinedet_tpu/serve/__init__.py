"""Deployment: AOT serialized artifacts + a micro-batching serving host."""

from refinedet_tpu.serve.export import (ServingModel, export_inference,
                                        load_serving, save_serving)
from refinedet_tpu.serve.server import BatchingEngine, Server, client_detect

__all__ = ["ServingModel", "export_inference", "load_serving",
           "save_serving", "BatchingEngine", "Server", "client_detect"]
