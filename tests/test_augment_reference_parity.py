"""SSDAugmentation parity against the ACTUAL reference pipeline.

The host augmentation chain (refinedet_tpu/data/augmentations.py) was
restructured from the reference's 20 transform classes
(/root/reference/utils/augmentations.py:401-418) into seeded
function-per-stage form, but its random-draw sites map 1:1 onto the
reference's in both kind and order:

  brightness gate/delta -> distort-order gate -> [contrast gate/alpha] ->
  saturation gate/alpha -> hue gate/delta -> [contrast gate/alpha] ->
  lighting-noise gate/perm -> expand gate/ratio/left/top ->
  crop mode + per-trial (w, h, left, top) -> mirror gate

So driving BOTH pipelines from identically-seeded
``np.random.Generator`` streams — ours natively, the reference via
stand-ins for its module-level ``random`` (numpy) and ``rdm`` (python)
names — must produce bit-identical images, boxes and labels. Any
divergence in geometry, constraint expressions (e.g. the quirky
``overlap.min() < min_iou and max_iou < overlap.max()`` retry), int()
truncation points, HSV conversion order, or mean handling breaks the
equality. This retires the builder-authored reading of the pipeline as
its only specification.
"""

import numpy as np
import pytest

pytest.importorskip("torch")  # the reference module imports torch
cv2 = pytest.importorskip("cv2")

from reference_modules import load_reference, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not mounted", allow_module_level=True)

REF = load_reference()

from refinedet_tpu.data.augmentations import SSDAugmentation  # noqa: E402

MEAN = (104, 117, 123)


class _ReplayNumpyRandom:
    """Stand-in for the reference's ``from numpy import random`` name,
    replaying draws from a shared ``np.random.Generator``."""

    def __init__(self, gen):
        self._gen = gen

    def randint(self, n):
        return int(self._gen.integers(n))

    def uniform(self, low=0.0, high=None):
        # the reference uses both uniform(high) (RandomSampleCrop:260-261)
        # and uniform(low, high) forms
        if high is None:
            low, high = 0.0, low
        return float(self._gen.uniform(low, high))


class _ReplayPyRandom:
    """Stand-in for the reference's ``import random as rdm`` name
    (used only for the crop-mode choice, RandomSampleCrop:239)."""

    def __init__(self, gen):
        self._gen = gen

    def choice(self, seq):
        return seq[int(self._gen.integers(len(seq)))]


def _rand_sample(seed):
    """Random image + absolute-pixel GT (the live sarship convention the
    reference pipeline expects with ToAbsoluteCoords disabled)."""
    r = np.random.RandomState(1000 + seed)
    h, w = r.randint(120, 320), r.randint(120, 320)
    img = r.randint(0, 256, (h, w, 3)).astype(np.uint8)
    n = r.randint(1, 6)
    x1 = r.uniform(0, w * 0.7, n)
    y1 = r.uniform(0, h * 0.7, n)
    boxes = np.stack([
        x1, y1,
        x1 + r.uniform(w * 0.1, w * 0.3, n),
        y1 + r.uniform(h * 0.1, h * 0.3, n),
    ], 1)
    boxes = np.minimum(boxes, [w - 1, h - 1, w - 1, h - 1]).astype(np.float32)
    labels = r.randint(1, 4, n).astype(np.int64)
    return img, boxes, labels


@pytest.mark.parametrize("seed", range(10))
def test_pipeline_parity_vs_reference(seed, monkeypatch):
    img, boxes, labels = _rand_sample(seed)

    gen_ref = np.random.default_rng(seed)
    monkeypatch.setattr(REF.augmentations, "random",
                        _ReplayNumpyRandom(gen_ref))
    monkeypatch.setattr(REF.augmentations, "rdm", _ReplayPyRandom(gen_ref))
    ref_aug = REF.augmentations.SSDAugmentation(size=320, mean=MEAN)
    r_img, r_boxes, r_labels = ref_aug(
        img.copy(), boxes.copy(), labels.copy())

    ours = SSDAugmentation(320, MEAN, boxes_normalized=False, to_rgb=False)
    o_img, o_boxes, o_labels = ours(
        img.copy(), boxes.copy(), labels.copy(),
        rng=np.random.default_rng(seed))

    assert r_img.shape == o_img.shape == (320, 320, 3)
    np.testing.assert_array_equal(r_labels, o_labels)
    np.testing.assert_allclose(o_boxes, r_boxes, atol=1e-6)
    np.testing.assert_allclose(o_img, r_img, atol=1e-4)


def test_draw_site_counts_match(monkeypatch):
    """Both pipelines must consume the SAME number of random draws —
    otherwise the replay-equality above could pass by luck on some seeds
    while the streams have actually diverged."""

    class Counting(_ReplayNumpyRandom):
        def __init__(self, gen, counter):
            super().__init__(gen)
            self._c = counter

        def randint(self, n):
            self._c[0] += 1
            return super().randint(n)

        def uniform(self, low=0.0, high=None):
            self._c[0] += 1
            return super().uniform(low, high)

    class CountingGen:
        """Wraps a np.random.Generator, counting integers/uniform calls."""

        def __init__(self, gen, counter):
            self._gen = gen
            self._c = counter

        def integers(self, n):
            self._c[0] += 1
            return self._gen.integers(n)

        def uniform(self, low, high):
            self._c[0] += 1
            return self._gen.uniform(low, high)

    for seed in range(6):
        img, boxes, labels = _rand_sample(seed)

        ref_count = [0]
        gen_ref = np.random.default_rng(seed)
        fake_np = Counting(gen_ref, ref_count)
        monkeypatch.setattr(REF.augmentations, "random", fake_np)

        class PyCounting(_ReplayPyRandom):
            def choice(self, seq):
                ref_count[0] += 1
                return super().choice(seq)

        monkeypatch.setattr(REF.augmentations, "rdm", PyCounting(gen_ref))
        REF.augmentations.SSDAugmentation(size=320, mean=MEAN)(
            img.copy(), boxes.copy(), labels.copy())

        our_count = [0]
        ours = SSDAugmentation(320, MEAN, boxes_normalized=False,
                               to_rgb=False)
        ours(img.copy(), boxes.copy(), labels.copy(),
             rng=CountingGen(np.random.default_rng(seed), our_count))

        assert ref_count[0] == our_count[0] > 0, (
            f"seed {seed}: reference drew {ref_count[0]} randoms, "
            f"ours drew {our_count[0]}")
