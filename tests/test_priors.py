import math

import numpy as np

from refinedet_tpu.boxes import generate_priors, PriorBox
from refinedet_tpu.config import coco_refinedet, voc_refinedet, voc_ssd


def test_prior_counts_320():
    # Golden counts from SURVEY.md: 6,375 priors at 320 (3 per cell over
    # feature maps [40, 20, 10, 5]).
    p = generate_priors(voc_refinedet["320"])
    assert p.shape == (6375, 4)


def test_prior_counts_512():
    p = generate_priors(coco_refinedet["512"])
    assert p.shape == (16320, 4)


def test_prior_counts_ssd300():
    # Stock SSD300: 8732 priors.
    p = generate_priors(voc_ssd["300"])
    assert p.shape == (8732, 4)


def test_prior_first_cell_values_320():
    p = generate_priors(voc_refinedet["320"])
    s = 32 / 320
    r = math.sqrt(2.0)
    want = np.array([
        [0.0125, 0.0125, s, s],
        [0.0125, 0.0125, s * r, s / r],
        [0.0125, 0.0125, s / r, s * r],
    ], dtype=np.float32)
    np.testing.assert_allclose(p[:3], want, atol=1e-6)


def test_prior_cell_ordering_row_major():
    # Second cell advances cx (j inner loop), cy fixed.
    p = generate_priors(voc_refinedet["320"])
    np.testing.assert_allclose(p[3, 0], 1.5 / 40, atol=1e-6)  # cx of (i=0,j=1)
    np.testing.assert_allclose(p[3, 1], 0.5 / 40, atol=1e-6)
    # First cell of the second feature map (20x20, step 16).
    base = 40 * 40 * 3
    np.testing.assert_allclose(p[base, :2], [0.5 / 20, 0.5 / 20], atol=1e-6)
    np.testing.assert_allclose(p[base, 2:], [64 / 320, 64 / 320], atol=1e-6)


def test_priors_clipped_to_unit_box():
    for cfg in (voc_refinedet["320"], coco_refinedet["512"], voc_ssd["300"]):
        p = generate_priors(cfg)
        assert p.min() >= 0.0 and p.max() <= 1.0


def test_priorbox_shim():
    cfg = voc_refinedet["320"]
    np.testing.assert_array_equal(PriorBox(cfg).forward(),
                                  generate_priors(cfg))
