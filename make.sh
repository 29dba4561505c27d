#!/usr/bin/env bash
# Counterpart of the reference's make.sh (reference: make.sh:1-8), which
# compiled the Cython/CUDA NMS extensions via utils/build.py. Here the only
# ahead-of-time native artifact is the C++ host NMS library; the TPU NMS is a
# Pallas kernel compiled by XLA at trace time (refinedet_tpu/ops/nms_pallas.py).
set -e
bash "$(dirname "$0")/native/build.sh"
