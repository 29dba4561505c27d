"""Torch->Flax checkpoint import parity: same weights => same outputs."""

import sys
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))

torch = pytest.importorskip("torch")

from torch_refinedet import TorchRefineDet  # noqa: E402
from refinedet_tpu.models import build_refinedet  # noqa: E402
from refinedet_tpu.models.torch_import import (  # noqa: E402
    torch_state_dict_to_flax, vgg16_reducedfc_to_flax, load_weights)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = TorchRefineDet(320, num_classes=4).eval()
    jmodel = build_refinedet("train", 320, 4)
    params = torch_state_dict_to_flax(tmodel.state_dict())
    return tmodel, jmodel, {"params": params}


def test_state_dict_covers_all_params(pair):
    tmodel, jmodel, variables = pair
    ref = jmodel.init(jax.random.PRNGKey(0))["params"]
    assert set(variables["params"].keys()) == set(ref.keys())
    for name, leaf in ref.items():
        for k, v in leaf.items():
            got = np.asarray(variables["params"][name][k])
            assert got.shape == v.shape, (name, k, got.shape, v.shape)


def test_forward_parity_torch_vs_flax(pair):
    tmodel, jmodel, variables = pair
    rng = np.random.RandomState(0)
    x = rng.randn(1, 320, 320, 3).astype(np.float32) * 30
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    j_out = jmodel.raw_forward(variables, jnp.asarray(x))
    names = ("arm_loc", "arm_conf", "odm_loc", "odm_conf")
    for name, t, j in zip(names, t_out, j_out):
        t = t.numpy()
        j = np.asarray(j)
        assert t.shape == j.shape, name
        scale = np.abs(t).max() + 1e-6
        err = np.abs(t - j).max() / scale
        assert err < 2e-4, (name, err)


def test_vgg_reducedfc_import(pair):
    tmodel, jmodel, _ = pair
    # Build a bare-vgg state dict like vgg16_reducedfc.pth ('0.weight', ...).
    vgg_sd = {k[len("vgg."):]: v for k, v in tmodel.state_dict().items()
              if k.startswith("vgg.")}
    sub = vgg16_reducedfc_to_flax(vgg_sd)
    init = jmodel.init(jax.random.PRNGKey(0))["params"]
    merged = dict(init)
    merged.update(sub)
    assert np.allclose(np.asarray(merged["vgg_conv1_1"]["kernel"]),
                       np.transpose(vgg_sd["0.weight"].numpy(),
                                    (2, 3, 1, 0)))
    # heads untouched
    assert merged["arm_loc0"] is init["arm_loc0"]


def test_load_weights_module_prefix(tmp_path, pair):
    tmodel, jmodel, _ = pair
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    path = str(tmp_path / "ckpt.pth")
    torch.save(sd, path)
    init = jmodel.init(jax.random.PRNGKey(0))["params"]
    loaded = load_weights(init, path)
    want = np.transpose(
        tmodel.state_dict()["vgg.0.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(loaded["vgg_conv1_1"]["kernel"]),
                               want)
