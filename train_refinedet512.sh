#!/usr/bin/env bash
python train_refinedet.py --dataset VOC --input_size 512 --batch_size 32 \
  --basenet weights/vgg16_reducedfc.pth --save_folder weights/voc512/ "$@"
