import numpy as np
import jax
import jax.numpy as jnp
import pytest

from refinedet_tpu.data.augment_jax import (augment_batch, hsv_to_rgb,
                                            photometric_distort, rgb_to_hsv,
                                            StagingTransform)


def test_hsv_roundtrip(rng):
    rgb = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-2)


def test_hsv_known_values():
    # pure red, mid gray
    hsv = np.asarray(rgb_to_hsv(jnp.asarray([[255.0, 0.0, 0.0],
                                             [128.0, 128.0, 128.0]])))
    np.testing.assert_allclose(hsv[0], [0.0, 1.0, 255.0], atol=1e-4)
    np.testing.assert_allclose(hsv[1], [0.0, 0.0, 128.0], atol=1e-4)


def _batch(rng, b=4, s0=128, m=6):
    images = rng.uniform(0, 255, (b, s0, s0, 3)).astype(np.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        n = rng.randint(1, m)
        xy = rng.uniform(5, s0 * 0.5, (n, 2))
        wh = rng.uniform(15, s0 * 0.4, (n, 2))
        boxes[i, :n] = np.hstack([xy, np.minimum(xy + wh, s0 - 1.0)])
        valid[i, :n] = True
    return jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid)


def test_augment_batch_contract(rng):
    images, boxes, valid = _batch(rng)
    out, nb, nv = augment_batch(images, boxes, valid,
                                jax.random.PRNGKey(0), out_size=64,
                                mean=(98.1, 98.1, 98.1))
    assert out.shape == (4, 64, 64, 3)
    assert nb.shape == boxes.shape and nv.shape == valid.shape
    nb_np, nv_np = np.asarray(nb), np.asarray(nv)
    assert np.isfinite(np.asarray(out)).all()
    # every image keeps at least one box (center-keep rule guarantees it
    # when cropping, identity keeps all)
    assert nv_np.any(axis=1).all()
    kept = nb_np[nv_np]
    assert kept.min() >= -1e-5 and kept.max() <= 1 + 1e-5
    assert (kept[:, 2:] >= kept[:, :2] - 1e-5).all()


def test_augment_deterministic_per_key(rng):
    images, boxes, valid = _batch(rng)
    a = augment_batch(images, boxes, valid, jax.random.PRNGKey(7),
                      out_size=64)
    b = augment_batch(images, boxes, valid, jax.random.PRNGKey(7),
                      out_size=64)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = augment_batch(images, boxes, valid, jax.random.PRNGKey(8),
                      out_size=64)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_identity_without_randomness(rng):
    """With geometry forced off (by probing many keys, at least one sample
    must keep all its boxes) the box pipeline is consistent."""
    images, boxes, valid = _batch(rng, b=1)
    found_identityish = False
    for seed in range(12):
        _, nb, nv = augment_batch(images, boxes, valid,
                                  jax.random.PRNGKey(seed), out_size=64)
        if np.asarray(nv).sum() == np.asarray(valid).sum():
            found_identityish = True
            break
    assert found_identityish


def test_staging_transform(rng):
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    boxes = np.array([[9.0, 6.0, 45.0, 30.0]], np.float32)
    labels = np.array([1], np.int32)
    st = StagingTransform(120)
    out, nb, nl = st(img, boxes, labels)
    assert out.shape == (120, 120, 3)
    # x scaled by 120/90, y by 120/60
    np.testing.assert_allclose(nb[0], [12.0, 12.0, 60.0, 60.0], atol=1e-4)
