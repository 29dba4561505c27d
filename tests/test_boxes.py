import numpy as np
import jax.numpy as jnp

from refinedet_tpu.boxes import (center_size, decode, encode, iou_pairwise,
                                 jaccard, point_form)
from oracles import (np_center_size, np_decode, np_encode, np_iou_matrix,
                     np_point_form)

VAR = (0.1, 0.2)


def random_boxes(rng, n, scale=1.0):
    """Random valid point-form boxes in [0, scale]."""
    xy1 = rng.uniform(0, 0.7 * scale, size=(n, 2))
    wh = rng.uniform(0.05 * scale, 0.3 * scale, size=(n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)


def test_point_center_roundtrip(rng):
    pf = random_boxes(rng, 64)
    cs = center_size(jnp.asarray(pf))
    np.testing.assert_allclose(np.asarray(cs), np_center_size(pf), atol=1e-6)
    back = point_form(cs)
    np.testing.assert_allclose(np.asarray(back), pf, atol=1e-6)


def test_jaccard_matches_oracle(rng):
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 37)
    got = np.asarray(jaccard(jnp.asarray(a), jnp.asarray(b)))
    want = np_iou_matrix(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Identity boxes have IoU 1 on the diagonal.
    self_iou = np.asarray(jaccard(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(self_iou), 1.0, atol=1e-6)


def test_iou_plus_one_convention():
    # Two identical single-pixel boxes: +1 convention -> area 1, IoU 1;
    # no +1 -> degenerate (0 area) handled by caller.
    a = np.array([[10.0, 10.0, 10.0, 10.0]], dtype=np.float32)
    got = np.asarray(iou_pairwise(jnp.asarray(a), jnp.asarray(a),
                                  plus_one=True))
    np.testing.assert_allclose(got, [[1.0]], atol=1e-6)


def test_encode_decode_roundtrip(rng):
    priors_pf = random_boxes(rng, 128)
    priors_cs = np_center_size(priors_pf)
    matched = random_boxes(rng, 128)
    enc = encode(jnp.asarray(matched), jnp.asarray(priors_cs), VAR)
    # XLA CPU's f32 log differs from libm by a few ulps; compare at a
    # detection-relevant tolerance.
    np.testing.assert_allclose(np.asarray(enc),
                               np_encode(matched, priors_cs, VAR), atol=1e-3)
    dec = decode(enc, jnp.asarray(priors_cs), VAR)
    # decode inverts encode up to the log(wh + 1e-5) epsilon.
    np.testing.assert_allclose(np.asarray(dec), matched, atol=1e-3)


def test_decode_matches_oracle(rng):
    priors_cs = np_center_size(random_boxes(rng, 50))
    loc = rng.randn(50, 4).astype(np.float32) * 0.5
    got = np.asarray(decode(jnp.asarray(loc), jnp.asarray(priors_cs), VAR))
    np.testing.assert_allclose(got, np_decode(loc, priors_cs, VAR), atol=1e-5)
