#!/usr/bin/env bash
# Build the native host-side NMS library (counterpart of the reference's
# make.sh -> utils/build.py Cython/CUDA build, reduced to one g++ line —
# no nvcc dispatch hack needed on the TPU stack).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 nms.cpp -o libnms.so
echo "built $(pwd)/libnms.so"
