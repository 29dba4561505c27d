"""AOT serving artifacts (``refinedet_tpu/serve/export.py``).

The artifact must reproduce the live inference path bit-for-bit (same
XLA program, weights baked in), serve any batch size when exported with a
symbolic batch dim, and fail loudly on format or batch mismatches. The
baked-in path is the reference's live Detect_RefineDet output contract —
raw (boxes, scores) with NMS deferred to the caller
(/root/reference/layers/functions/detection_refinedet.py:27-65).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from refinedet_tpu.models import build_refinedet  # noqa: E402
from refinedet_tpu.serve import load_serving, save_serving  # noqa: E402


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_refinedet("test", 320, 2)
    return model, model.init(jax.random.PRNGKey(0))


def _imgs(rng, b):
    return rng.randn(b, 320, 320, 3).astype(np.float32)


def test_roundtrip_matches_live_model(tmp_path, model_and_vars):
    model, variables = model_and_vars
    path = str(tmp_path / "m.rdtpu")
    meta = save_serving(model, variables, path, platforms=("cpu",))
    assert meta["input_size"] == 320 and meta["num_classes"] == 2
    assert meta["batch_size"] is None  # symbolic

    serving = load_serving(path)
    rng = np.random.RandomState(0)
    img = _imgs(rng, 2)
    got_b, got_s = serving(img)
    want_b, want_s = model.apply(variables, jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_symbolic_batch_serves_any_size(tmp_path, model_and_vars):
    model, variables = model_and_vars
    path = str(tmp_path / "m.rdtpu")
    save_serving(model, variables, path, platforms=("cpu",))
    serving = load_serving(path)
    rng = np.random.RandomState(1)
    for b in (1, 3):
        boxes, scores = serving(_imgs(rng, b))
        assert boxes.shape == (b, 6375, 4)
        assert scores.shape == (b, 6375, 2)


def test_fixed_batch_guard(tmp_path, model_and_vars):
    model, variables = model_and_vars
    path = str(tmp_path / "m2.rdtpu")
    meta = save_serving(model, variables, path, batch_size=2,
                        platforms=("cpu",))
    assert meta["batch_size"] == 2
    serving = load_serving(path)
    rng = np.random.RandomState(2)
    serving(_imgs(rng, 2))  # exact batch OK
    with pytest.raises(ValueError, match="exported for batch 2"):
        serving(_imgs(rng, 1))


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "junk.rdtpu"
    path.write_bytes(b"NOTANARTIFACT" * 4)
    with pytest.raises(ValueError, match="not a refinedet-tpu"):
        load_serving(str(path))


def test_train_phase_rejected(model_and_vars):
    _, variables = model_and_vars
    train_model = build_refinedet("train", 320, 2)
    with pytest.raises(ValueError, match="test"):
        save_serving(train_model, variables, "/dev/null")


def test_int8_artifact_matches_live_quant_model(tmp_path, model_and_vars):
    """The int8 PTQ twin exports like any model: quantize, bake, round
    trip; artifact output is bit-identical to the live quantized model
    and the metadata records int8=True."""
    from refinedet_tpu.quant import quantize_model

    model, variables = model_and_vars
    rng = np.random.RandomState(5)
    model_q, vq = quantize_model(model, variables, [_imgs(rng, 2)])
    path = str(tmp_path / "int8.rdtpu")
    meta = save_serving(model_q, vq, path, platforms=("cpu",))
    assert meta["int8"] is True

    serving = load_serving(path)
    img = _imgs(rng, 2)
    got_b, got_s = serving(img)
    want_b, want_s = model_q.apply(vq, jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))

    # CLI path: a pre-quantized Orbax checkpoint exports with --int8 ...
    import orbax.checkpoint as ocp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from export_serving import main as export_main

    ckpt = str(tmp_path / "quantized_ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt, dict(vq))
    ckptr.wait_until_finished()
    out = str(tmp_path / "cli_int8.rdtpu")
    export_main(["--checkpoint", ckpt, "--out", out, "--int8",
                 "--input_size", "320", "--num_classes", "2",
                 "--platforms", "cpu"])
    cli_b, _ = load_serving(out)(img)
    np.testing.assert_array_equal(np.asarray(cli_b), np.asarray(want_b))

    # ... and a NON-quantized checkpoint is rejected up front.
    bare = str(tmp_path / "bare_ckpt")
    ckptr.save(bare, dict(model_and_vars[1]))
    ckptr.wait_until_finished()
    with pytest.raises(SystemExit, match="no quantized convs"):
        export_main(["--checkpoint", bare, "--out", "/dev/null", "--int8",
                     "--input_size", "320", "--num_classes", "2",
                     "--platforms", "cpu"])


def test_cli_full_circle_from_pth(tmp_path, model_and_vars):
    """tools/export_serving.py end to end: Flax weights -> reference-format
    .pth (torch_export) -> CLI loads it back through the eval driver's
    loader -> serving artifact that matches the live model."""
    from refinedet_tpu.models.torch_export import save_torch_checkpoint

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from export_serving import main as export_main

    model, variables = model_and_vars
    pth = str(tmp_path / "ckpt.pth")
    save_torch_checkpoint(variables, pth)
    out = str(tmp_path / "cli.rdtpu")
    # --dtype float32 pins bit-equality with the f32 live model (the CLI's
    # default is bfloat16, the eval drivers' serving dtype).
    export_main(["--checkpoint", pth, "--out", out,
                 "--input_size", "320", "--num_classes", "2",
                 "--platforms", "cpu", "--dtype", "float32"])
    serving = load_serving(out)
    rng = np.random.RandomState(4)
    img = _imgs(rng, 2)
    got_b, got_s = serving(img)
    want_b, want_s = model.apply(variables, jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_cross_platform_artifact_runs_on_cpu(tmp_path, model_and_vars):
    """Default platforms=(tpu, cpu): lowering is cross-platform, so the
    artifact produced on this CPU host must still execute on CPU."""
    model, variables = model_and_vars
    path = str(tmp_path / "xplat.rdtpu")
    meta = save_serving(model, variables, path)
    assert set(meta["platforms"]) == {"tpu", "cpu"}
    serving = load_serving(path)
    rng = np.random.RandomState(3)
    img = _imgs(rng, 1)
    got_b, _ = serving(img)
    want_b, _ = model.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=1e-6)


def _evaluator_for(model, nms_top_k=64, plus_one=False):
    from refinedet_tpu.config import DetectConfig
    from refinedet_tpu.eval import Evaluator

    cfg = DetectConfig(num_classes=model.num_classes)
    return Evaluator(model, None, cfg, None, batch_size=2,
                     nms_top_k=nms_top_k, plus_one=plus_one,
                     log=lambda s: None)


def test_fused_nms_artifact_matches_evaluator(tmp_path, model_and_vars):
    """--fused_nms bakes the Evaluator's whole post-processing (decode +
    per-class NMS + compaction) into the artifact: output must equal
    Evaluator._forward_postprocess on unit scales, and the metadata must
    describe the dets layout."""
    model, variables = model_and_vars
    path = str(tmp_path / "fused.rdtpu")
    fused = {"nms_top_k": 64, "plus_one": False}
    meta = save_serving(model, variables, path, platforms=("cpu",),
                        fused_nms=fused)
    assert meta["fused_nms"] == fused
    assert "dets[b, C-1, K, 5]" in meta["output"]

    serving = load_serving(path)
    rng = np.random.RandomState(7)
    img = _imgs(rng, 2)
    got = np.asarray(serving(img))
    assert got.shape == (2, model.num_classes - 1, 64, 5)

    ev = _evaluator_for(model, nms_top_k=64, plus_one=False)
    want = np.asarray(ev._forward_postprocess(
        variables, jnp.asarray(img), jnp.ones((2, 4), jnp.float32)))
    # The artifact and the live jit are separate XLA compilations of the
    # same math; fusion choices differ by last-ulp (observed <= 1.2e-7),
    # so tight allclose, not bitwise equality.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_nms_int8_artifact_matches_live_quant(tmp_path,
                                                    model_and_vars):
    """The int8 PTQ twin composes with --fused_nms: the quantized
    artifact's dets equal the live quantized model run through the same
    Evaluator post-processing."""
    from refinedet_tpu.quant import quantize_model

    model, variables = model_and_vars
    rng = np.random.RandomState(8)
    model_q, vq = quantize_model(model, variables, [_imgs(rng, 2)])
    path = str(tmp_path / "fused_int8.rdtpu")
    meta = save_serving(model_q, vq, path, platforms=("cpu",),
                        fused_nms={"nms_top_k": 32})
    assert meta["int8"] is True and meta["fused_nms"]["nms_top_k"] == 32

    img = _imgs(rng, 1)
    got = np.asarray(load_serving(path)(img))
    ev = _evaluator_for(model_q, nms_top_k=32, plus_one=False)
    want = np.asarray(ev._forward_postprocess(
        vq, jnp.asarray(img), jnp.ones((1, 4), jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_nms_unknown_key_rejected(model_and_vars):
    model, variables = model_and_vars
    with pytest.raises(ValueError, match="unknown keys.*top_k_typo"):
        save_serving(model, variables, "/dev/null", platforms=("cpu",),
                     fused_nms={"top_k_typo": 3})


def test_fused_nms_plus_one_rejected(model_and_vars):
    """+1 area is a pixel-space convention; the artifact's normalized
    boxes make it meaningless, so the export refuses it outright."""
    model, variables = model_and_vars
    with pytest.raises(ValueError, match="plus_one.*pixel-space"):
        save_serving(model, variables, "/dev/null", platforms=("cpu",),
                     fused_nms={"plus_one": True})


def test_fused_nms_tpu_only_export_embeds_pallas(tmp_path, model_and_vars):
    """platforms=('tpu',) + fused NMS lowers the Pallas suppression-sweep
    kernel into the artifact (a tpu.custom_call in the StableHLO): the
    export must succeed on this CPU host (cross-platform lowering), carry
    tpu-only metadata, and contain the Mosaic custom call the portable
    XLA formulation never emits."""
    model, variables = model_and_vars
    path = str(tmp_path / "tpu_only.rdtpu")
    meta = save_serving(model, variables, path, platforms=("tpu",),
                        batch_size=2, fused_nms={"nms_top_k": 16})
    assert meta["platforms"] == ["tpu"]
    serving = load_serving(path)
    hlo = serving.exported.mlir_module()
    assert "tpu_custom_call" in hlo  # the Pallas kernel
    # and the cross-platform twin must NOT embed it
    path2 = str(tmp_path / "xplat_fused.rdtpu")
    save_serving(model, variables, path2, platforms=("tpu", "cpu"),
                 batch_size=2, fused_nms={"nms_top_k": 16})
    assert "tpu_custom_call" not in load_serving(path2).exported.mlir_module()


def test_fused_nms_tpu_only_symbolic_batch(tmp_path, model_and_vars):
    """Symbolic-batch (batch_size=None) + tpu-only fused NMS: the Pallas
    sweep's grid/SMEM block scale with batch*classes and Pallas rejects
    dynamically-shaped blocks, so the export scans over the batch dim
    (export.py lax.map branch). Regression: this combination — the one
    the serving engine's default export actually uses on a TPU host —
    failed to lower before the scan fallback existed."""
    model, variables = model_and_vars
    path = str(tmp_path / "tpu_sym.rdtpu")
    meta = save_serving(model, variables, path, platforms=("tpu",),
                        batch_size=None, fused_nms={"nms_top_k": 16})
    assert meta["batch_size"] is None
    hlo = load_serving(path).exported.mlir_module()
    assert "tpu_custom_call" in hlo  # still the Pallas kernel inside


def test_uint8_wire_artifact_exact_vs_f32_path(tmp_path, model_and_vars):
    """uint8-wire artifact (raw pixels on the wire, mean-subtract baked
    in): bit-identical to feeding the f32 artifact the host-subtracted
    image. Exact because integer pixels and the means are exactly
    representable in f32 — the same staging trick as
    data/augment_jax.py's StagingTransform."""
    model, variables = model_and_vars
    mean_bgr = (104.0, 117.0, 123.0)
    path_u8 = str(tmp_path / "u8.rdtpu")
    meta = save_serving(model, variables, path_u8, platforms=("cpu",),
                        uint8_input=True, input_mean=mean_bgr)
    assert meta["input_dtype"] == "uint8"
    assert meta["input_mean_bgr"] == list(mean_bgr)
    path_f32 = str(tmp_path / "f32.rdtpu")
    save_serving(model, variables, path_f32, platforms=("cpu",))

    rng = np.random.RandomState(7)
    raw = rng.randint(0, 256, (2, 320, 320, 3)).astype(np.uint8)
    u8 = load_serving(path_u8)
    assert u8.input_dtype == np.uint8
    got_b, got_s = u8(raw)
    # host-side equivalent: f32 cast, subtract RGB-ordered mean
    pre = raw.astype(np.float32) - np.asarray(mean_bgr[::-1], np.float32)
    want_b, want_s = load_serving(path_f32)(pre)
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(want_b))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))


def test_uint8_wire_validation(model_and_vars):
    model, variables = model_and_vars
    with pytest.raises(ValueError, match="input_mean only applies"):
        save_serving(model, variables, "/dev/null",
                     platforms=("cpu",), input_mean=(1.0, 2.0, 3.0))
    with pytest.raises(ValueError, match="3 channels"):
        save_serving(model, variables, "/dev/null", platforms=("cpu",),
                     uint8_input=True, input_mean=(1.0, 2.0))


def test_uint8_wire_default_mean_is_reference_means(tmp_path,
                                                    model_and_vars):
    """Flagless uint8 export defaults to the reference's VOC MEANS
    (104, 117, 123) — /root/reference/data/config.py's BaseTransform
    convention."""
    model, variables = model_and_vars
    path = str(tmp_path / "u8d.rdtpu")
    meta = save_serving(model, variables, path, platforms=("cpu",),
                        uint8_input=True)
    assert meta["input_mean_bgr"] == [104.0, 117.0, 123.0]
