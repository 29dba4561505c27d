"""Int8 PTQ serving path: QuantConv mechanics, calibration capture,
f32->int8 conversion, and closeness of the quantized model's outputs.

No reference counterpart (the reference serves f32); these pin the
TPU-native serving addition in refinedet_tpu/quant/ptq.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from refinedet_tpu.models import build_refinedet
from refinedet_tpu.models.layers import QuantConv
from refinedet_tpu.quant import (calibrate_amax, quantize_model,
                                 quantize_variables)

# Quantized conv set for the four-source 320/512 models (trunk minus
# conv1_1, extras, TCB) — must mirror RefineDet._conv quantizable flags.
QUANTIZED_320 = (
    ["vgg_conv1_2", "vgg_conv2_1", "vgg_conv2_2", "vgg_conv3_1",
     "vgg_conv3_2", "vgg_conv3_3", "vgg_conv4_1", "vgg_conv4_2",
     "vgg_conv4_3", "vgg_conv5_1", "vgg_conv5_2", "vgg_conv5_3",
     "vgg_conv6", "vgg_conv7", "extra_conv1", "extra_conv2"]
    + [f"tcb0_{i}_conv1" for i in range(4)]
    + [f"tcb0_{i}_conv2" for i in range(4)]
    + [f"tcb2_{i}_conv" for i in range(4)])


def test_quantconv_exact_on_grid(rng):
    """On-grid inputs and int8-grid weights reproduce the f32 conv exactly
    (symmetric quantization has no systematic error inside the grid)."""
    cin, cout, k = 8, 16, 3
    in_scale = rng.uniform(0.05, 0.25, cin).astype(np.float32)
    w_scale = (rng.uniform(0.01, 0.05, cout)).astype(np.float32)
    kernel_q = rng.randint(-127, 128, (k, k, cin, cout)).astype(np.int8)
    bias = rng.randn(cout).astype(np.float32)
    x_int = rng.randint(-127, 128, (2, 10, 10, cin)).astype(np.float32)
    x = jnp.asarray(x_int * in_scale)  # on-grid per channel

    conv = QuantConv(features=cout, kernel=k, padding=1, dtype=jnp.float32)
    variables = {"params": {"kernel_q": jnp.asarray(kernel_q),
                            "w_scale": jnp.asarray(w_scale),
                            "in_scale": jnp.asarray(in_scale),
                            "bias": jnp.asarray(bias)}}
    got = conv.apply(variables, x)

    # effective f32 weight: folded scales divide back out per input channel
    w = (kernel_q.astype(np.float32) * w_scale
         / in_scale[None, None, :, None])
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)


def test_calibration_captures_all_quantized_convs(rng):
    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    amax = calibrate_amax(model, variables, [images])
    assert sorted(amax) == sorted(QUANTIZED_320)
    for name, stats in amax.items():
        # [amax, p99.99, p99.9, p99] x [cin]: per-input-channel,
        # non-negative (dead relu channels can record 0), monotone
        # non-increasing down the percentile rows
        assert stats.ndim == 2 and stats.shape[0] == 4, (name, stats.shape)
        assert np.all(stats >= 0) and stats[0].max() > 0, name
        assert np.all(np.diff(stats, axis=0) <= 1e-5)
    # running max over batches: a second, brighter batch can only raise it
    amax2 = calibrate_amax(model, variables, [images, images * 2.0])
    assert all(np.all(amax2[k] >= amax[k] - 1e-6) for k in amax)


def test_quantize_variables_tree(rng):
    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    model_q, vq = quantize_model(model, variables, [images],
                                 dtype=jnp.float32, quant_skip=())
    params_q = vq["params"]
    for name in QUANTIZED_320:
        leaves = params_q[name]
        assert leaves["kernel_q"].dtype == jnp.int8
        assert leaves["w_scale"].shape == (leaves["kernel_q"].shape[-1],)
        assert float(jnp.max(jnp.abs(leaves["kernel_q"]))) <= 127
        # scales reconstruct the f32 weight within half a (folded) step:
        # W ~= kernel_q * w_scale / in_scale[c]
        w = np.asarray(variables["params"][name]["kernel"])
        in_s = np.asarray(leaves["in_scale"])[None, None, :, None]
        w_hat = (np.asarray(leaves["kernel_q"], np.float32)
                 * np.asarray(leaves["w_scale"])) / in_s
        step = np.asarray(leaves["w_scale"]) / in_s
        assert np.all(np.abs(w - w_hat) <= 0.5 * step + 1e-7)
    # sensitive layers stay f32
    for name in ["vgg_conv1_1", "arm_loc0", "arm_conf0", "odm_loc0",
                 "odm_conf0", "conv4_3_L2Norm", "tcb1_0_deconv"]:
        assert "kernel_q" not in params_q[name]
        ref_leaves = variables["params"][name]
        for leaf, val in params_q[name].items():
            np.testing.assert_array_equal(np.asarray(val),
                                          np.asarray(ref_leaves[leaf]))


def test_quantized_model_outputs_close(rng):
    """Head outputs of the int8 model track the f32 model within a few
    percent in relative L2 on random-init weights."""
    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    model_q, vq = quantize_model(model, variables, [images],
                                 dtype=jnp.float32, quant_skip=())

    ref = model.raw_forward(variables, jnp.asarray(images))
    got = model_q.raw_forward(vq, jnp.asarray(images))
    names = ["arm_loc", "arm_conf", "odm_loc", "odm_conf"]
    for name, r, g in zip(names, ref, got):
        r, g = np.asarray(r), np.asarray(g)
        rel = np.linalg.norm(g - r) / (np.linalg.norm(r) + 1e-12)
        assert rel < 0.06, f"{name}: relative L2 error {rel:.4f}"

    # the full test-phase path (softmax + cascade decode) runs and agrees:
    # random-init logits have std ~19, so a max-diff bound on softmax
    # outputs is ill-conditioned near class ties — assert distributional
    # agreement (top-1 class match + mean prob error) instead
    boxes_f, scores_f = model.apply(variables, jnp.asarray(images))
    boxes_q, scores_q = model_q.apply(vq, jnp.asarray(images))
    assert boxes_q.shape == boxes_f.shape
    assert scores_q.shape == scores_f.shape
    sf, sq = np.asarray(scores_f), np.asarray(scores_q)
    top1_agree = np.mean(sf.argmax(-1) == sq.argmax(-1))
    assert top1_agree > 0.97, top1_agree
    assert np.mean(np.abs(sq - sf)) < 0.02


def test_bias_correction_delta_matches_bruteforce(rng):
    """On-grid activations isolate the weight-rounding error, which is
    linear in x — so the measured mean output error must equal
    bias_correction_delta exactly, and adding the delta as bias must
    cancel it."""
    from refinedet_tpu.quant import bias_correction_delta

    cin, cout = 8, 6
    in_scale = rng.uniform(0.05, 0.25, cin).astype(np.float32)
    w = (rng.randn(1, 1, cin, cout) * 0.1).astype(np.float32)
    # quantize exactly as quantize_variables does
    w_folded = w * in_scale[None, None, :, None]
    w_scale = np.maximum(np.abs(w_folded).max(axis=(0, 1, 2)) / 127.0,
                         1e-12).astype(np.float32)
    kernel_q = np.clip(np.round(w_folded / w_scale), -127, 127) \
        .astype(np.int8)
    # activations on the int8 grid: round(x/in_scale) is error-free, with
    # a nonzero per-channel mean so there is something to correct
    x_int = rng.randint(-100, 128, (4, 16, 16, cin)).astype(np.float32)
    x = x_int * in_scale
    mean_x = x.reshape(-1, cin).mean(axis=0)

    delta = bias_correction_delta(w, kernel_q, w_scale, in_scale, mean_x)

    conv = QuantConv(features=cout, kernel=1, padding=0, dtype=jnp.float32)

    def run(bias):
        return np.asarray(conv.apply(
            {"params": {"kernel_q": jnp.asarray(kernel_q),
                        "w_scale": jnp.asarray(w_scale),
                        "in_scale": jnp.asarray(in_scale),
                        "bias": jnp.asarray(bias)}}, jnp.asarray(x)))

    want = np.einsum("bhwc,co->bhwo", x, w[0, 0])
    err = (want - run(np.zeros(cout, np.float32))).reshape(-1, cout)
    np.testing.assert_allclose(err.mean(axis=0), delta,
                               rtol=1e-4, atol=1e-6)
    corrected = (want - run(delta)).reshape(-1, cout)
    assert np.abs(corrected.mean(axis=0)).max() <= 1e-5


def test_quantize_model_bias_correct(rng):
    """bias_correct=True changes exactly the quantized convs' biases — by
    the delta recomputable from the calibration means — and the corrected
    model still tracks f32 within the uncorrected closeness bound."""
    from refinedet_tpu.quant import bias_correction_delta

    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)

    amax, means = calibrate_amax(model, variables, [images],
                                 return_means=True)
    assert sorted(means) == sorted(QUANTIZED_320)
    for name, m in means.items():
        assert m.shape == amax[name].shape[1:], name
        assert np.all(np.isfinite(m)), name

    model_q, vq = quantize_model(model, variables, [images],
                                 dtype=jnp.float32, quant_skip=())
    model_qc, vqc = quantize_model(model, variables, [images],
                                   dtype=jnp.float32, quant_skip=(),
                                   bias_correct=True)
    changed = 0
    for name in QUANTIZED_320:
        a, b = vq["params"][name], vqc["params"][name]
        np.testing.assert_array_equal(np.asarray(a["kernel_q"]),
                                      np.asarray(b["kernel_q"]))
        np.testing.assert_array_equal(np.asarray(a["in_scale"]),
                                      np.asarray(b["in_scale"]))
        delta = bias_correction_delta(
            np.asarray(variables["params"][name]["kernel"]),
            np.asarray(a["kernel_q"]), np.asarray(a["w_scale"]),
            np.asarray(a["in_scale"]), means[name])
        np.testing.assert_allclose(
            np.asarray(b["bias"]), np.asarray(a["bias"]) + delta,
            rtol=1e-5, atol=1e-7)
        changed += int(np.abs(delta).max() > 0)
    assert changed > 0  # the correction is not a no-op
    # non-quantized leaves untouched
    np.testing.assert_array_equal(
        np.asarray(vq["params"]["arm_loc0"]["bias"]),
        np.asarray(vqc["params"]["arm_loc0"]["bias"]))

    ref = model.raw_forward(variables, jnp.asarray(images))
    got = model_qc.raw_forward(vqc, jnp.asarray(images))
    for name, r, g in zip(["arm_loc", "arm_conf", "odm_loc", "odm_conf"],
                          ref, got):
        r, g = np.asarray(r), np.asarray(g)
        rel = np.linalg.norm(g - r) / (np.linalg.norm(r) + 1e-12)
        assert rel < 0.06, f"{name}: relative L2 error {rel:.4f}"

    # a precomputed amax cannot carry means
    with pytest.raises(ValueError, match="bias_correct"):
        quantize_model(model, variables, [images], amax=amax,
                       bias_correct=True)


def test_quant_requires_test_phase():
    with pytest.raises(ValueError):
        build_refinedet("train", 320, 3, quant=True)


def test_quantize_bn_variant(rng):
    """The BN variant quantizes too: BN stays (unfolded) after the int8
    conv, batch_stats pass through the converter."""
    model = build_refinedet("test", 320, 3, use_bn=True)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    model_q, vq = quantize_model(model, variables, [images],
                                 dtype=jnp.float32)
    assert model_q.use_bn
    assert "batch_stats" in vq
    assert "kernel_q" in vq["params"]["vgg_conv3_1"]
    boxes, scores = model_q.apply(vq, jnp.asarray(images))
    assert np.all(np.isfinite(np.asarray(scores)))


def test_default_quant_skip_keeps_early_vgg_f32(rng):
    """quantize_model's default skip (accuracy-critical early VGG convs)
    leaves those layers as plain f32 convs."""
    from refinedet_tpu.quant import DEFAULT_QUANT_SKIP
    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    model_q, vq = quantize_model(model, variables, [images],
                                 dtype=jnp.float32)
    for name in DEFAULT_QUANT_SKIP:
        assert "kernel_q" not in vq["params"][name], name
        assert "kernel" in vq["params"][name]
    assert "kernel_q" in vq["params"]["vgg_conv3_1"]


# -- GPTQ second-order weight rounding (quant/gptq.py) -----------------------


def _layer_mse(x_patches, w_mat_true, q, w_scale):
    """Calibration-stream output MSE of a rounding choice."""
    w_hat = q.astype(np.float64) * np.asarray(w_scale, np.float64)
    d = x_patches @ (w_mat_true - w_hat)
    return float(np.mean(d ** 2))


def test_patch_order_matches_conv(rng):
    """conv_general_dilated_patches emits (c, kh, kw)-major features —
    the ordering quant/gptq.py builds its Hessians and weight matrices
    in. Pinned against a real dilated+strided conv."""
    from jax import lax

    x = jnp.asarray(rng.randn(2, 13, 13, 5).astype(np.float32))
    w = rng.randn(3, 3, 5, 7).astype(np.float32)
    for stride, pad, dil in ((1, 1, 1), (2, 1, 1), (1, 3, 3)):
        out = lax.conv_general_dilated(
            x, jnp.asarray(w), (stride, stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        p = lax.conv_general_dilated_patches(
            x, (3, 3), (stride, stride), ((pad, pad), (pad, pad)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        pm = np.asarray(p).reshape(-1, 45)
        wm = w.transpose(2, 0, 1, 3).reshape(45, 7)  # (c, kh, kw)-major
        np.testing.assert_allclose(pm @ wm,
                                   np.asarray(out).reshape(-1, 7),
                                   rtol=1e-4, atol=1e-4)


def test_gptq_exact_on_grid(rng):
    """Weights already on the int8 grid round to themselves — the error
    feedback must not perturb an exact solution."""
    from refinedet_tpu.quant import gptq_round

    kh = kw = 3
    cin, cout = 4, 6
    w_scale = np.full(cout, 0.05, np.float32)
    in_scale = rng.uniform(0.5, 2.0, cin).astype(np.float32)
    q_true = rng.randint(-127, 128, (kh, kw, cin, cout)).astype(np.float32)
    w = q_true * w_scale / in_scale[None, None, :, None]
    x = rng.randn(500, kh * kw * cin).astype(np.float32)
    h = (x.T @ x / len(x)).astype(np.float32)
    # hessian is for RAW inputs; map patch dims back through in_scale
    s_rep = np.repeat(in_scale, kh * kw)
    h_raw = h * (s_rep[:, None] * s_rep[None, :])
    q = gptq_round(w.astype(np.float32), in_scale, w_scale, h_raw)
    np.testing.assert_array_equal(
        q, q_true.astype(np.int8))


def test_gptq_beats_round_to_nearest(rng):
    """On a correlated input distribution the second-order rounding gives
    strictly lower calibration-stream output MSE than round-to-nearest."""
    from refinedet_tpu.quant import gptq_round

    kh = kw = 1  # pure matmul layer keeps the bookkeeping transparent
    cin, cout = 24, 16
    # strongly correlated inputs: where RTN is most suboptimal
    basis = rng.randn(6, cin).astype(np.float32)
    x = rng.randn(2000, 6).astype(np.float32) @ basis \
        + 0.05 * rng.randn(2000, cin).astype(np.float32)
    w = rng.randn(kh, kw, cin, cout).astype(np.float32)
    in_scale = np.abs(x).max(axis=0).astype(np.float32) / 127.0
    w_folded = w * in_scale[None, None, :, None]
    w_scale = (np.abs(w_folded).max(axis=(0, 1, 2)) / 127.0).astype(
        np.float32)
    h_raw = (x.T @ x / len(x)).astype(np.float32)

    q_gptq = gptq_round(w, in_scale, w_scale, h_raw)
    q_rtn = np.clip(np.round(w_folded / w_scale), -127, 127).astype(np.int8)

    xf = x / in_scale  # folded activations, as QuantConv sees them
    wm = w_folded.reshape(cin, cout)
    mse_gptq = _layer_mse(xf, wm, q_gptq.reshape(cin, cout), w_scale)
    mse_rtn = _layer_mse(xf, wm, q_rtn.reshape(cin, cout), w_scale)
    assert mse_gptq < mse_rtn * 0.9, (mse_gptq, mse_rtn)


def test_accumulate_hessians_and_geometry(rng):
    """The Hessian capture covers every quantizable conv with the right
    patch dimension K = kh*kw*cin for its geometry (incl. the dilated
    conv6 and strided extra_conv2), and streams across batches (two
    batches == one doubled batch up to normalization)."""
    from refinedet_tpu.quant import accumulate_hessians, conv_geometry

    model = build_refinedet("test", 320, 2)
    variables = model.init(jax.random.PRNGKey(0))
    imgs = rng.uniform(-120, 130, (2, 320, 320, 3)).astype(np.float32)

    hs = accumulate_hessians(model, variables, [imgs], max_sub_batch=2)
    assert sorted(hs) == sorted(QUANTIZED_320)
    for name in ("vgg_conv6", "extra_conv2", "vgg_conv7", "tcb2_0_conv"):
        kshape = np.shape(variables["params"][name]["kernel"])
        kh, kw, stride, pad, dil = conv_geometry(name, kshape)
        kdim = kh * kw * kshape[2]
        assert hs[name].shape == (kdim, kdim), name
        # symmetric PSD-ish
        np.testing.assert_allclose(hs[name], hs[name].T, atol=1e-2)
    assert conv_geometry("vgg_conv6", (3, 3, 1024, 1024))[4] == 3
    assert conv_geometry("extra_conv2", (3, 3, 256, 512))[2] == 2

    hs2 = accumulate_hessians(model, variables,
                              [imgs[:1], imgs[1:]], max_sub_batch=4)
    np.testing.assert_allclose(hs2["vgg_conv7"], hs["vgg_conv7"],
                               rtol=1e-4, atol=1e-3)


def test_accumulate_hessians_rejects_geometry_mismatch(rng, monkeypatch):
    """The model sows each quantizable conv's true geometry next to the
    calib_x capture; if the name-based table in quant.gptq.conv_geometry
    ever disagrees (e.g. a future conv with non-default stride), the
    Hessian pass must fail loudly instead of silently building a
    mismatched im2col Hessian (ADVICE r4)."""
    import refinedet_tpu.quant.gptq as gptq_mod

    model = build_refinedet("test", 320, 2)
    variables = model.init(jax.random.PRNGKey(0))
    imgs = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)

    real = gptq_mod.conv_geometry

    def wrong(name, kshape):
        kh, kw, stride, pad, dil = real(name, kshape)
        if name == "vgg_conv7":
            stride += 1  # simulate a stale table entry
        return kh, kw, stride, pad, dil

    monkeypatch.setattr(gptq_mod, "conv_geometry", wrong)
    with pytest.raises(ValueError, match="vgg_conv7.*disagrees"):
        gptq_mod.accumulate_hessians(model, variables, [imgs],
                                     names=("vgg_conv7",))


def test_quantize_model_gptq_end_to_end(rng):
    """weight_opt='gptq' composes with the full PTQ path (+ bias
    correction) and does not hurt the head-output error vs plain
    rounding on the calibration distribution. Restricted to a few convs
    via weight_opt_names to keep the 1-core-CPU solve time bounded; the
    full-coverage path is what tools/ablate_int8.py runs on the chip."""
    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)

    ref = [np.asarray(r) for r in
           model.raw_forward(variables, jnp.asarray(images))]

    def err(mq, vq):
        got = mq.raw_forward(vq, jnp.asarray(images))
        return sum(np.linalg.norm(np.asarray(g) - r)
                   / (np.linalg.norm(r) + 1e-12)
                   for r, g in zip(ref, got))

    m_rtn, v_rtn = quantize_model(model, variables, [images],
                                  dtype=jnp.float32, quant_skip=())
    m_gptq, v_gptq = quantize_model(
        model, variables, [images], dtype=jnp.float32, quant_skip=(),
        weight_opt="gptq", bias_correct=True,
        weight_opt_names=("vgg_conv7", "extra_conv1", "tcb2_0_conv"))
    for name in ("vgg_conv7", "extra_conv1", "tcb2_0_conv"):
        assert not np.array_equal(
            np.asarray(v_gptq["params"][name]["kernel_q"]),
            np.asarray(v_rtn["params"][name]["kernel_q"])), \
            f"{name}: GPTQ produced the identical rounding — suspicious"
    e_rtn, e_gptq = err(m_rtn, v_rtn), err(m_gptq, v_gptq)
    assert np.isfinite(e_gptq)
    # on the calibration distribution itself GPTQ must not be worse
    assert e_gptq < e_rtn * 1.02, (e_gptq, e_rtn)

    with pytest.raises(ValueError, match="weight_opt"):
        quantize_model(model, variables, [images], weight_opt="adaround")


def test_gptq_cache_reuses_and_validates(rng, monkeypatch):
    """A caller-owned gptq_cache makes repeat quantizations of the same
    weights skip the host-side Cholesky solve entirely (the ablation
    harness's serving-arm sweep), and a scale mismatch falls back to a
    recompute instead of returning a stale kernel."""
    import refinedet_tpu.quant.gptq as gptq_mod
    from refinedet_tpu.quant.gptq import accumulate_hessians

    model = build_refinedet("test", 320, 3)
    variables = model.init(jax.random.PRNGKey(0))
    images = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    amax = calibrate_amax(model, variables, [images])
    names = ("vgg_conv7", "extra_conv1")
    hessians = accumulate_hessians(model, variables, [images], names=names)
    mq = build_refinedet("test", 320, 3, quant=True, quant_skip=(),
                         dtype=jnp.float32)

    cache = {}
    v1 = quantize_variables(mq, variables, amax, hessians=hessians,
                            gptq_cache=cache)
    assert set(cache) == set(names)

    # A second pass over the same weights must be pure cache hits: poison
    # the solver so any call fails the test.
    def _boom(*a, **k):
        raise AssertionError("gptq_round called on a cache hit")

    monkeypatch.setattr(gptq_mod, "gptq_round", _boom)
    v2 = quantize_variables(mq, variables, amax, hessians=hessians,
                            gptq_cache=cache)
    for n in names:
        np.testing.assert_array_equal(
            np.asarray(v1["params"][n]["kernel_q"]),
            np.asarray(v2["params"][n]["kernel_q"]))
    monkeypatch.undo()

    # Scale mismatch (different weights/calibration behind the same conv
    # name) must recompute, not reuse.
    stale_in, stale_w, stale_q = cache["vgg_conv7"]
    cache["vgg_conv7"] = (stale_in * 2.0, stale_w, stale_q)
    v3 = quantize_variables(mq, variables, amax, hessians=hessians,
                            gptq_cache=cache)
    np.testing.assert_array_equal(
        np.asarray(v1["params"]["vgg_conv7"]["kernel_q"]),
        np.asarray(v3["params"]["vgg_conv7"]["kernel_q"]))
    # and the refreshed entry carries the true scales again
    np.testing.assert_array_equal(cache["vgg_conv7"][0], stale_in)


def test_ablation_arm_skip_resolution():
    """Regression: the ablation harness's "default" arms must resolve to
    DEFAULT_QUANT_SKIP, not the builder's () default — the bug made
    int8-default-* arms silent duplicates of int8-full-*."""
    import os.path as osp
    import sys
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))
    from ablate_int8 import INT8_CONFIGS, resolve_quant_skip
    from refinedet_tpu.quant import DEFAULT_QUANT_SKIP

    assert resolve_quant_skip(None) == DEFAULT_QUANT_SKIP
    assert resolve_quant_skip(()) == ()
    default_skip = resolve_quant_skip(INT8_CONFIGS["int8-default"][0])
    full_skip = resolve_quant_skip(INT8_CONFIGS["int8-full"][0])
    assert default_skip != full_skip
    # the resolved skips produce different quantized templates
    m_def = build_refinedet("test", 320, 2, quant=True,
                            quant_skip=default_skip)
    m_full = build_refinedet("test", 320, 2, quant=True,
                             quant_skip=full_skip)
    t_def = jax.eval_shape(lambda: m_def.init(jax.random.PRNGKey(0)))
    t_full = jax.eval_shape(lambda: m_full.init(jax.random.PRNGKey(0)))
    for name in DEFAULT_QUANT_SKIP:
        assert "kernel_q" not in t_def["params"][name]
        assert "kernel_q" in t_full["params"][name]
