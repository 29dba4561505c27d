"""Synthetic tiny datasets for end-to-end data/eval tests."""

import json
import os
import os.path as osp

import numpy as np

try:
    import cv2
except ImportError:
    cv2 = None


def make_coco_dataset(root, name="sarship", split="train", num_images=4,
                      img_size=96, seed=0):
    """Write a tiny COCO-format dataset (images + instances json).

    Each image has 1-3 ship boxes drawn as bright rectangles on noise.
    Returns the annotation dict.
    """
    rng = np.random.RandomState(seed)
    coco_name = f"{name}_{split}"
    img_dir = osp.join(root, coco_name)
    ann_dir = osp.join(root, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        img_id = i + 1
        fname = f"{img_id:06d}.jpg"
        img = rng.randint(0, 80, (img_size, img_size, 3)).astype(np.uint8)
        n_obj = rng.randint(1, 4)
        for _ in range(n_obj):
            w = rng.randint(12, img_size // 2)
            h = rng.randint(12, img_size // 2)
            x = rng.randint(0, img_size - w)
            y = rng.randint(0, img_size - h)
            img[y:y + h, x:x + w] = 220
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "bbox": [float(x), float(y), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
            })
            ann_id += 1
        cv2.imwrite(osp.join(img_dir, fname), img)
        images.append({"id": img_id, "file_name": fname,
                       "width": img_size, "height": img_size})

    dataset = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "ship",
                        "supercategory": "ship"}],
    }
    with open(osp.join(ann_dir, f"instances_{coco_name}.json"), "w") as f:
        json.dump(dataset, f)
    return dataset
