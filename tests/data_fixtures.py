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


def _draw_class_pattern(img, x, y, w, h, pattern):
    """Draw one bright object whose CLASS is encoded in its *silhouette*
    (not color — SSDAugmentation's photometric distortion randomizes hue /
    shuffles channels, so color-coded classes are unlearnable through the
    reference augmentation chain; and not fine texture — Expand can shrink
    objects up to 4x, erasing thin stripes/borders at resize): 0 = filled
    rect, 1 = filled ellipse, 2 = filled triangle, 3 = thick plus/cross."""
    v = 220
    k = pattern % 4
    if k == 0:
        img[y:y + h, x:x + w] = v
    elif k == 1:
        cv2.ellipse(img, (x + w // 2, y + h // 2), (w // 2, h // 2),
                    0, 0, 360, (v, v, v), -1)
    elif k == 2:
        pts = np.array([[x + w // 2, y], [x, y + h - 1],
                        [x + w - 1, y + h - 1]], np.int32)
        cv2.fillPoly(img, [pts], (v, v, v))
    else:
        tw, th = max(3, w // 3), max(3, h // 3)
        cx, cy = x + (w - tw) // 2, y + (h - th) // 2
        img[y:y + h, cx:cx + tw] = v
        img[cy:cy + th, x:x + w] = v


def make_voc_dataset(root, year="2007", image_set="trainval",
                     num_images=4, img_size=96, seed=0,
                     classes=("aeroplane", "bicycle"),
                     class_colors=None, class_patterns=False,
                     difficult_prob=0.0):
    """Write a tiny VOCdevkit tree (JPEGImages + XML Annotations +
    ImageSets/Main list) with bright-rectangle objects.

    ``class_colors`` (optional list of BGR triples, one per class) gives
    each class a distinct fill color; ``class_patterns=True`` encodes the
    class in the object's shape/texture instead, which survives the
    photometric augmentations — used by the learnability e2e smoke
    (tools/smoke_voc_e2e.py)."""
    rng = np.random.RandomState(seed)
    base = osp.join(root, "VOC" + year)
    for sub in ("JPEGImages", "Annotations",
                osp.join("ImageSets", "Main")):
        os.makedirs(osp.join(base, sub), exist_ok=True)
    ids = []
    for i in range(num_images):
        img_id = f"{i:06d}"
        ids.append(img_id)
        img = rng.randint(0, 80, (img_size, img_size, 3)).astype(np.uint8)
        objs = []
        for _ in range(rng.randint(1, 3)):
            # silhouette-coded classes need enough pixels to survive the
            # up-to-4x Expand shrink; plain bright rects can be smaller
            lo = img_size // 4 if class_patterns else 14
            w = rng.randint(lo, img_size // 2)
            h = rng.randint(lo, img_size // 2)
            x = rng.randint(0, img_size - w)
            y = rng.randint(0, img_size - h)
            ci = rng.randint(len(classes))
            if class_patterns:
                _draw_class_pattern(img, x, y, w, h, ci)
            else:
                img[y:y + h, x:x + w] = (220 if class_colors is None
                                         else class_colors[ci])
            name = classes[ci]
            diff = int(rng.uniform() < difficult_prob)
            # VOC XML is 1-based inclusive; pose/truncated included for
            # parsers that require them (the reference's parse_rec,
            # eval_refinedet_voc.py:106-123).
            objs.append(
                f"<object><name>{name}</name><pose>Unspecified</pose>"
                f"<truncated>0</truncated><difficult>{diff}</difficult>"
                f"<bndbox><xmin>{x + 1}</xmin><ymin>{y + 1}</ymin>"
                f"<xmax>{x + w}</xmax><ymax>{y + h}</ymax></bndbox>"
                f"</object>")
        cv2.imwrite(osp.join(base, "JPEGImages", img_id + ".jpg"), img)
        xml = (f"<annotation><filename>{img_id}.jpg</filename>"
               f"<size><width>{img_size}</width>"
               f"<height>{img_size}</height><depth>3</depth></size>"
               + "".join(objs) + "</annotation>")
        with open(osp.join(base, "Annotations", img_id + ".xml"),
                  "w") as f:
            f.write(xml)
    with open(osp.join(base, "ImageSets", "Main",
                       image_set + ".txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids
