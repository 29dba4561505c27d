#!/usr/bin/env bash
python eval_refinedet_coco.py --input_size 512 --prefix weights/2e3/ --sweep "$@"
