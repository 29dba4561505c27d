"""Independent numpy oracle implementations of the reference semantics.

Hand-derived from the behavior documented in SURVEY.md §2.2 (sequential
matching loops, +1/no +1 NMS area conventions, variance codec). Deliberately
written loop-style so they are easy to audit — the framework's vectorized XLA
code is validated against these.
"""

import numpy as np


def np_point_form(cs):
    return np.concatenate([cs[:, :2] - cs[:, 2:] / 2,
                           cs[:, :2] + cs[:, 2:] / 2], axis=1)


def np_center_size(pf):
    return np.concatenate([(pf[:, :2] + pf[:, 2:]) / 2,
                           pf[:, 2:] - pf[:, :2]], axis=1)


def np_iou_matrix(a, b):
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            ix1 = max(a[i, 0], b[j, 0]); iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2]); iy2 = min(a[i, 3], b[j, 3])
            iw = max(0.0, ix2 - ix1); ih = max(0.0, iy2 - iy1)
            inter = iw * ih
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            out[i, j] = inter / (area_a + area_b - inter)
    return out


def np_encode(matched_pf, priors_cs, variances):
    g_cxcy = (matched_pf[:, :2] + matched_pf[:, 2:]) / 2 - priors_cs[:, :2]
    g_cxcy = g_cxcy / (variances[0] * priors_cs[:, 2:])
    g_wh = (matched_pf[:, 2:] - matched_pf[:, :2]) / priors_cs[:, 2:]
    g_wh = np.log(g_wh + 1e-5) / variances[1]
    return np.concatenate([g_cxcy, g_wh], axis=1)


def np_decode(loc, priors_cs, variances):
    cxcy = priors_cs[:, :2] + loc[:, :2] * variances[0] * priors_cs[:, 2:]
    wh = priors_cs[:, 2:] * np.exp(loc[:, 2:] * variances[1])
    mins = cxcy - wh / 2
    return np.concatenate([mins, mins + wh], axis=1)


def np_match(threshold, truths, priors_cs, variances, labels,
             label_offset=1, arm_loc=None):
    """Sequential-loop oracle of match/refine_match semantics.

    Returns (loc_t [P,4], conf_t [P]). ``label_offset=1`` reproduces SSD
    ``match``; 0 reproduces ``refine_match``. ``arm_loc`` switches to
    ODM-mode anchors.
    """
    if arm_loc is None:
        anchors_pf = np_point_form(priors_cs)
        encode_base = priors_cs
    else:
        anchors_pf = np_decode(arm_loc, priors_cs, variances)
        encode_base = np_center_size(anchors_pf)
    overlaps = np_iou_matrix(truths, anchors_pf)  # [M, P]

    best_prior_idx = overlaps.argmax(1)           # per-GT best anchor
    best_truth_overlap = overlaps.max(0)          # per-anchor
    best_truth_idx = overlaps.argmax(0)
    # Sequential force-assign: later GT overwrites on shared best anchor.
    for j in range(len(truths)):
        best_truth_overlap[best_prior_idx[j]] = 2.0
        best_truth_idx[best_prior_idx[j]] = j

    matches = truths[best_truth_idx]
    conf = labels[best_truth_idx].astype(np.int64) + label_offset
    conf[best_truth_overlap < threshold] = 0
    loc = np_encode(matches, encode_base, variances)
    return loc, conf


def np_greedy_nms(dets, thresh, plus_one=True):
    """Greedy hard NMS oracle (score-desc order), both area conventions.

    ``dets`` is [N, 5] (x1, y1, x2, y2, score); returns kept indices.
    With plus_one=True this mirrors the reference's C/CUDA/numpy NMS family;
    with False, the torch nms in box_utils.py:222-286.
    """
    off = 1.0 if plus_one else 0.0
    x1, y1, x2, y2, sc = (dets[:, i] for i in range(5))
    areas = (x2 - x1 + off) * (y2 - y1 + off)
    order = sc.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + off)
        h = np.maximum(0.0, yy2 - yy1 + off)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep
