"""Reverse checkpoint interop: Flax -> reference PyTorch ``.pth``.

Pins ``models/torch_export.py`` three ways:
  (a) round trip (export -> torch_import) is bit-exact per leaf;
  (b) the exported state_dict strict-loads into the ACTUAL reference nets
      (``/root/reference/models/refinedet.py:278-291`` plain,
      ``refinedet_bn.py:377-387`` BN) — strict=True means every key the
      reference expects is present with the right shape, nothing extra;
  (c) forward parity: the reference net running the exported weights
      produces the same head outputs as the Flax model that exported them,
      so a TPU-trained checkpoint really is servable from the reference
      stack.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_modules import load_reference, reference_available  # noqa: E402

from refinedet_tpu.models import build_refinedet  # noqa: E402
from refinedet_tpu.models.torch_export import (  # noqa: E402
    flax_to_torch_state_dict, flax_to_torch_state_dict_bn,
    save_torch_checkpoint)
from refinedet_tpu.models.torch_import import (  # noqa: E402
    torch_state_dict_to_flax, torch_state_dict_to_flax_bn)

RTOL = 1e-4  # forward parity: f32 conv stacks, CPU vs CPU


def _assert_trees_bitexact(a, b):
    fa = jax.tree.flatten_with_path(a)[0]
    fb = jax.tree.flatten_with_path(b)[0]
    assert [k for k, _ in fa] == [k for k, _ in fb]
    for (key, va), (_, vb) in zip(fa, fb):
        assert np.array_equal(np.asarray(va, np.float32),
                              np.asarray(vb, np.float32)), key


def _randomized_batch_stats(variables, rng):
    """init() gives mean=0/var=1; randomize so a mean/var or scale/bias
    swap in the export mapping cannot cancel out."""
    stats = jax.tree.map(lambda x: x, variables["batch_stats"])
    out = {}
    for name, leaf in stats.items():
        out[name] = {
            "mean": jnp.asarray(rng.randn(*np.shape(leaf["mean"]))
                                .astype(np.float32)),
            "var": jnp.asarray(
                rng.uniform(0.2, 2.0, np.shape(leaf["var"]))
                .astype(np.float32)),
        }
    return {"params": variables["params"], "batch_stats": out}


def test_roundtrip_plain_bitexact():
    model = build_refinedet("train", 320, 21)
    variables = model.init(jax.random.PRNGKey(0))
    state = flax_to_torch_state_dict(variables["params"])
    back = torch_state_dict_to_flax(state)
    _assert_trees_bitexact(variables["params"], back)


def test_roundtrip_bn_bitexact():
    model = build_refinedet("train", 512, 2, use_bn=True)
    variables = _randomized_batch_stats(
        model.init(jax.random.PRNGKey(1)), np.random.RandomState(1))
    state = flax_to_torch_state_dict_bn(variables)
    back = torch_state_dict_to_flax_bn(state)
    _assert_trees_bitexact(variables["params"], back["params"])
    _assert_trees_bitexact(variables["batch_stats"], back["batch_stats"])


@pytest.mark.skipif(not reference_available(),
                    reason="/root/reference not mounted")
def test_strict_load_and_forward_parity_plain(tmp_path):
    import torch

    REF = load_reference()
    model = build_refinedet("train", 320, 21)
    variables = model.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(variables, path)

    ref_net = REF.refinedet.build_refinedet("train", 320, 21).eval()
    ref_net.load_state_dict(torch.load(path), strict=True)  # raises on miss

    x = np.random.RandomState(0).randn(2, 3, 320, 320).astype(np.float32)
    with torch.no_grad():
        t_out = ref_net(torch.from_numpy(x))
    j_out = model.raw_forward(variables,
                              jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    for name, t, j in zip(("arm_loc", "arm_conf", "odm_loc", "odm_conf"),
                          t_out, j_out):
        t, j = t.numpy(), np.asarray(j)
        assert np.abs(t - j).max() <= RTOL * np.abs(t).max(), name


@pytest.mark.skipif(not reference_available(),
                    reason="/root/reference not mounted")
def test_strict_load_and_forward_parity_bn(tmp_path):
    import torch

    REF = load_reference()
    num_classes = 2
    model = build_refinedet("train", 512, num_classes, use_bn=True)
    variables = _randomized_batch_stats(
        model.init(jax.random.PRNGKey(3)), np.random.RandomState(3))
    path = str(tmp_path / "exported_bn.pth")
    save_torch_checkpoint(variables, path, use_bn=True)

    ref_net = REF.refinedet_bn.build_refinedet(
        "train", 512, num_classes, backbone_dict=dict(bn=True)).eval()
    ref_net.load_state_dict(torch.load(path), strict=True)

    x = np.random.RandomState(1).randn(1, 3, 512, 512).astype(np.float32)
    with torch.no_grad():
        t_out = ref_net(torch.from_numpy(x))
    j_out = model.raw_forward(variables,
                              jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    for name, t, j in zip(("arm_loc", "arm_conf", "odm_loc", "odm_conf"),
                          t_out, j_out):
        t, j = t.numpy(), np.asarray(j)
        assert np.abs(t - j).max() <= RTOL * np.abs(t).max(), name


def test_save_accepts_bare_params(tmp_path):
    import torch

    model = build_refinedet("train", 320, 21)
    variables = model.init(jax.random.PRNGKey(4))
    params = variables["params"] if "params" in variables else variables
    path = save_torch_checkpoint(params, str(tmp_path / "bare.pth"))
    state = torch.load(path)
    assert "vgg.0.weight" in state and state["vgg.0.weight"].shape == \
        (64, 3, 3, 3)
