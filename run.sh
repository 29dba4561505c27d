#!/usr/bin/env bash
# Training invocations (counterpart of the reference's run.sh multi-GPU
# lines; here the device mesh is all local TPU chips automatically).
set -e
python train_refinedet.py --dataset COCO --input_size 512 --batch_size 32 \
  --lr 2e-3 --num_workers 12 --save_folder weights/2e3/ "$@"
