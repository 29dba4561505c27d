import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refinedet_tpu.models import build_refinedet, expected_num_priors
from refinedet_tpu.models.refinedet import RefineDet


@pytest.fixture(scope="module")
def tiny320():
    model = build_refinedet("train", 320, 21)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_head_shapes_320(tiny320):
    model, params = tiny320
    x = jnp.zeros((2, 320, 320, 3))
    arm_loc, arm_conf, odm_loc, odm_conf, priors = model.apply(params, x)
    p = expected_num_priors(320)
    assert p == 6375
    assert arm_loc.shape == (2, p, 4)
    assert arm_conf.shape == (2, p, 2)
    assert odm_loc.shape == (2, p, 4)
    assert odm_conf.shape == (2, p, 21)
    assert priors.shape == (p, 4)


def test_source_resolutions_match_priors(tiny320):
    # The concatenated head length must equal the anchor-grid size for each
    # level: 3 * (40^2 + 20^2 + 10^2 + 5^2).
    assert expected_num_priors(320) == 3 * (1600 + 400 + 100 + 25)
    assert expected_num_priors(512) == 16320


def test_test_phase_returns_boxes_scores(tiny320):
    _, params = tiny320
    model = build_refinedet("test", 320, 21)
    x = jnp.zeros((1, 320, 320, 3))
    boxes, scores = model.apply(params, x)
    assert boxes.shape == (1, 6375, 4)
    assert scores.shape == (1, 6375, 21)
    # scores are softmax probabilities (or zeroed by objectness filter).
    s = np.asarray(scores)
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_bn_variant_has_batch_stats():
    model = build_refinedet("train", 320, 2, use_bn=True)
    variables = model.init(jax.random.PRNGKey(0))
    assert "batch_stats" in variables
    x = jnp.zeros((1, 320, 320, 3))
    out, mutated = model.raw_forward(variables, x, train=True,
                                    mutable=["batch_stats"])
    assert out[0].shape == (1, 6375, 4)
    assert "batch_stats" in mutated


def test_param_count_reasonable(tiny320):
    _, params = tiny320
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    # Reference RefineDet320-VOC is ~34M params.
    assert 30e6 < n < 40e6, n


def test_forward_is_jittable(tiny320):
    model, params = tiny320
    fn = jax.jit(lambda v, x: model.apply(v, x))
    out = fn(params, jnp.zeros((1, 320, 320, 3)))
    assert out[0].shape == (1, 6375, 4)


def test_896_five_source_variant():
    from refinedet_tpu.boxes import generate_priors
    from refinedet_tpu.config import voc_refinedet
    model = build_refinedet("train", 896, 21)
    params = model.init(jax.random.PRNGKey(0))
    p = expected_num_priors(896)
    assert p == 3 * (224**2 + 112**2 + 56**2 + 28**2 + 14**2)
    assert generate_priors(voc_refinedet["896"]).shape == (p, 4)
    # five ARM/ODM heads + conv3_3 L2Norm present
    names = set(params["params"].keys())
    assert {"arm_loc4", "odm_conf4", "tcb0_4_conv1",
            "conv3_3_L2Norm"} <= names
    x = jnp.zeros((1, 896, 896, 3))
    arm_loc, arm_conf, odm_loc, odm_conf, priors = model.apply(params, x)
    assert arm_loc.shape == (1, p, 4)
    assert odm_conf.shape == (1, p, 21)


def test_pool_backward_variants_bitwise_identical():
    """The alternate slice-based 2x2 maxpool backward (kept as a measured
    negative result, models/layers.py POOL_BACKWARD) must stay gradient-
    bitwise-identical to XLA's select_and_scatter VJP — including on ties
    (first window element in row-major order wins, the torch MaxPool2d
    convention) and under ceil_mode's -inf edge padding."""
    import refinedet_tpu.models.layers as layers

    rng = np.random.RandomState(0)
    # quantized values force ties inside 2x2 windows
    x = np.round(rng.randn(2, 10, 12, 3).astype(np.float32) * 2) / 2
    cases = [(False, x, rng.randn(2, 5, 6, 3).astype(np.float32)),
             (True, x[:, :9, :11], rng.randn(2, 5, 6, 3).astype(np.float32))]
    prev = layers.POOL_BACKWARD
    try:
        for ceil, xx, rr in cases:
            grads = {}
            for mode in ("select_scatter", "slice"):
                layers.POOL_BACKWARD = mode

                def f(a):
                    return jnp.sum(layers.max_pool_2x2(a, ceil_mode=ceil)
                                   * rr)

                grads[mode] = np.asarray(jax.grad(f)(jnp.asarray(xx)))
            np.testing.assert_array_equal(grads["slice"],
                                          grads["select_scatter"])
    finally:
        layers.POOL_BACKWARD = prev


class TestStemS2D:
    """Space-to-depth stem folding (models/stem_s2d.py): the stem_s2d
    model with folded weights is numerically the SAME function as the
    standard model — blocked conv1_1, four-phase conv1_2 and the
    phase-max pool1 are exact reformulations, not approximations."""

    def _pair(self, size=320, num_classes=21, seed=0):
        from refinedet_tpu.models import fold_stem_variables
        m0 = build_refinedet("test", size, num_classes)
        m1 = build_refinedet("test", size, num_classes, stem_s2d=True)
        v0 = m0.init(jax.random.PRNGKey(seed))
        return m0, m1, v0, fold_stem_variables(v0)

    @pytest.mark.parametrize("size", [320, 512])
    def test_raw_heads_match(self, size):
        m0, m1, v0, v1 = self._pair(size)
        img = jnp.asarray(np.random.RandomState(1).uniform(
            -120, 130, (2, size, size, 3)).astype(np.float32))
        h0 = jax.jit(lambda v, x: m0.raw_forward(v, x))(v0, img)
        h1 = jax.jit(lambda v, x: m1.raw_forward(v, x))(v1, img)
        for a, b in zip(h0, h1):
            a, b = np.asarray(a), np.asarray(b)
            # identical up to f32 re-association of the conv sums
            np.testing.assert_allclose(
                b, a, atol=2e-3 * max(1.0, np.abs(a).max()), rtol=0)

    def test_detect_path_matches(self):
        m0, m1, v0, v1 = self._pair()
        # Random-init loc heads emit O(100) logits whose exp-decode
        # overflows and amplifies f32 noise unboundedly; scale them to
        # trained-magnitude outputs before comparing the decode path.
        import jax.tree_util as jtu

        def damp(tree):
            out = jax.tree.map(lambda x: x, tree)  # copy
            for k in list(out["params"]):
                if k.startswith(("arm_loc", "odm_loc")):
                    out["params"][k] = jax.tree.map(
                        lambda x: x * 1e-3, out["params"][k])
            return out

        v0 = damp(v0)
        from refinedet_tpu.models import fold_stem_variables
        v1 = fold_stem_variables(v0)
        img = jnp.asarray(np.random.RandomState(2).uniform(
            -120, 130, (2, 320, 320, 3)).astype(np.float32))
        b0, s0 = jax.jit(m0.apply)(v0, img)
        b1, s1 = jax.jit(m1.apply)(v1, img)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                   atol=1e-4, rtol=0)

    def test_param_flops_accounting(self):
        """The folded stem carries exactly the original information: the
        4x4 blocked conv1_1 kernel has the 3x3x3x64 weights four times
        (zeros elsewhere), each phase conv has 9/16 of conv1_2."""
        _, _, v0, v1 = self._pair()
        w1 = np.asarray(v0["params"]["vgg_conv1_1"]["kernel"])
        k1 = np.asarray(v1["params"]["stem_conv1"]["kernel"])
        assert k1.shape == (4, 4, 3, 256)
        assert np.count_nonzero(k1) == 4 * np.count_nonzero(w1)
        w2 = np.asarray(v0["params"]["vgg_conv1_2"]["kernel"])
        for di in (0, 1):
            for dj in (0, 1):
                k = np.asarray(
                    v1["params"][f"stem_conv2_{di}{dj}"]["kernel"])
                assert k.shape == (2, 2, 256, 64)
                assert np.count_nonzero(k) == np.count_nonzero(w2)
        assert "vgg_conv1_1" not in v1["params"]
        assert "vgg_conv1_2" not in v1["params"]

    def test_guards(self):
        with pytest.raises(ValueError, match="inference-only"):
            build_refinedet("train", 320, 21, stem_s2d=True)
        m = build_refinedet("test", 320, 21, use_bn=True)
        from refinedet_tpu.models.refinedet import RefineDet as RD
        bad = RD(size=320, num_classes=21, use_bn=True, stem_s2d=True)
        with pytest.raises(ValueError, match="plain-model"):
            bad.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 320, 320, 3), jnp.float32), train=False)
