"""PyTorch checkpoint importer (reference .pth -> Flax params).

Loads the reference's ``state_dict`` layouts
(``/root/reference/models/refinedet.py`` module naming; ``module.``-prefixed
DataParallel checkpoints handled like ``eval_refinedet_coco.py:77-97``) and
the ``vgg16_reducedfc.pth`` backbone-only file, converting NCHW conv weights
to the NHWC/HWIO layout of refinedet_tpu.models.refinedet.RefineDet.

Key mapping (torch ModuleList index -> flax submodule name):
  vgg.{0,2,5,7,10,12,14,17,19,21,24,26,28}  -> vgg_conv{1_1..5_3}
  vgg.{31,33}                               -> vgg_conv6, vgg_conv7
  extras.{0,1}                              -> extra_conv{1,2}
  arm_loc.i / arm_conf.i / odm_loc.i / odm_conf.i -> arm_loc{i} etc.
  tcb0.{3i, 3i+2}   -> tcb0_{i}_conv{1,2}
  tcb1.{i}          -> tcb1_{i}_deconv (ConvTranspose)
  tcb2.{3i+1}       -> tcb2_{i}_conv
  conv4_3_L2Norm / conv5_3_L2Norm           -> same name
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

VGG_CONV_IDX = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
    31: "conv6", 33: "conv7",
}


def _strip_module_prefix(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove the DataParallel 'module.' wrapper if present."""
    if any(k.startswith("module.") for k in state):
        return {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in state.items()}
    return dict(state)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [out, in, kh, kw] -> flax HWIO [kh, kw, in, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose HWIO.

    flax's ConvTranspose (lax.conv_transpose, no kernel flip) computes the
    same function as torch's ConvTranspose2d when the kernel is mirrored
    spatially, i.e. [in, out, kh, kw] -> flip(kh, kw) -> [kh, kw, in, out].
    Validated numerically in tests/test_torch_import.py.
    """
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _as_numpy(state: Mapping) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def torch_state_dict_to_flax(state: Mapping, num_sources: int = 4
                             ) -> Dict[str, dict]:
    """Convert a full RefineDet torch state_dict to a flax params dict.

    Channel order: NO BGR<->RGB flip is applied to conv1_1 — deliberately.
    The reference trains and evaluates on RGB (its loaders convert after
    the transform: voc0712.py:135, sarship_coco.py:199), so reference
    checkpoints expect RGB inputs, exactly what this framework's
    transforms produce. (This inherits ssd.pytorch's quirk of feeding RGB
    to the Caffe-lineage vgg16_reducedfc backbone; parity means
    reproducing it.)"""
    state = _strip_module_prefix(_as_numpy(state))
    params: Dict[str, dict] = {}

    def put_conv(flax_name, torch_name, deconv=False):
        w = state[torch_name + ".weight"]
        kern = _deconv_kernel(w) if deconv else _conv_kernel(w)
        params[flax_name] = {"kernel": kern,
                             "bias": state[torch_name + ".bias"]}

    for idx, name in VGG_CONV_IDX.items():
        put_conv(f"vgg_{name}", f"vgg.{idx}")
    for norm in ("conv4_3_L2Norm", "conv5_3_L2Norm"):
        params[norm] = {"weight": state[norm + ".weight"]}
    put_conv("extra_conv1", "extras.0")
    put_conv("extra_conv2", "extras.1")
    for i in range(num_sources):
        put_conv(f"arm_loc{i}", f"arm_loc.{i}")
        put_conv(f"arm_conf{i}", f"arm_conf.{i}")
        put_conv(f"odm_loc{i}", f"odm_loc.{i}")
        put_conv(f"odm_conf{i}", f"odm_conf.{i}")
        put_conv(f"tcb0_{i}_conv1", f"tcb0.{3 * i}")
        put_conv(f"tcb0_{i}_conv2", f"tcb0.{3 * i + 2}")
        put_conv(f"tcb2_{i}_conv", f"tcb2.{3 * i + 1}")
        if i < num_sources - 1:
            put_conv(f"tcb1_{i}_deconv", f"tcb1.{i}", deconv=True)
    return params


# BN-variant vgg ModuleList layout (refinedet_bn.py:246-269: every conv is
# followed by its BatchNorm2d at idx+1, then ReLU; pools shift the indices
# vs the plain layout — tap tables at refinedet_bn.py:48-52).
BN_VGG_CONV_IDX = {
    0: "conv1_1", 3: "conv1_2", 7: "conv2_1", 10: "conv2_2",
    14: "conv3_1", 17: "conv3_2", 20: "conv3_3",
    24: "conv4_1", 27: "conv4_2", 30: "conv4_3",
    34: "conv5_1", 37: "conv5_2", 40: "conv5_3",
    44: "conv6", 47: "conv7",
}


def torch_state_dict_to_flax_bn(state: Mapping, num_sources: int = 4
                                ) -> Dict[str, dict]:
    """Convert a BN-variant RefineDet state_dict (refinedet_bn.py, built
    with backbone_dict=dict(bn=True)) to flax variables: returns
    {"params": ..., "batch_stats": ...}. Heads/TCB carry no BN (add_tcb,
    arm/odm_multibox have no batch_norm branch); extras BNs sit at
    ModuleList indices 1 and 4 (add_extras, refinedet_bn.py:273-293).

    ``num_sources=5`` covers the 896 five-source variant (conv3_3 L2Norm
    tap, refinedet_bn.py:56-59)."""
    state = _strip_module_prefix(_as_numpy(state))
    params: Dict[str, dict] = {}
    stats: Dict[str, dict] = {}

    def put_conv(flax_name, torch_name, deconv=False):
        w = state[torch_name + ".weight"]
        kern = _deconv_kernel(w) if deconv else _conv_kernel(w)
        params[flax_name] = {"kernel": kern,
                             "bias": state[torch_name + ".bias"]}

    def put_bn(flax_name, torch_name):
        params[flax_name] = {"scale": state[f"{torch_name}.weight"],
                             "bias": state[f"{torch_name}.bias"]}
        stats[flax_name] = {"mean": state[f"{torch_name}.running_mean"],
                            "var": state[f"{torch_name}.running_var"]}

    for idx, name in BN_VGG_CONV_IDX.items():
        put_conv(f"vgg_{name}", f"vgg.{idx}")
        put_bn(f"vgg_{name}_bn", f"vgg.{idx + 1}")
    for norm in ("conv4_3_L2Norm", "conv5_3_L2Norm", "conv3_3_L2Norm"):
        if norm + ".weight" in state:
            params[norm] = {"weight": state[norm + ".weight"]}
    put_conv("extra_conv1", "extras.0")
    put_bn("extra_conv1_bn", "extras.1")
    put_conv("extra_conv2", "extras.3")
    put_bn("extra_conv2_bn", "extras.4")
    for i in range(num_sources):
        put_conv(f"arm_loc{i}", f"arm_loc.{i}")
        put_conv(f"arm_conf{i}", f"arm_conf.{i}")
        put_conv(f"odm_loc{i}", f"odm_loc.{i}")
        put_conv(f"odm_conf{i}", f"odm_conf.{i}")
        put_conv(f"tcb0_{i}_conv1", f"tcb0.{3 * i}")
        put_conv(f"tcb0_{i}_conv2", f"tcb0.{3 * i + 2}")
        put_conv(f"tcb2_{i}_conv", f"tcb2.{3 * i + 1}")
        if i < num_sources - 1:
            put_conv(f"tcb1_{i}_deconv", f"tcb1.{i}", deconv=True)
    return {"params": params, "batch_stats": stats}


def vgg16_reducedfc_to_flax(state: Mapping) -> Dict[str, dict]:
    """Convert the vgg16_reducedfc.pth backbone file (keys '0.weight' ...
    '33.weight', i.e. a bare vgg ModuleList state_dict) to the flax
    vgg_* params subset, for backbone-pretrained training
    (reference README.md:74-80)."""
    state = _strip_module_prefix(_as_numpy(state))
    params = {}
    for idx, name in VGG_CONV_IDX.items():
        params[f"vgg_{name}"] = {
            "kernel": _conv_kernel(state[f"{idx}.weight"]),
            "bias": state[f"{idx}.bias"],
        }
    return params


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file on CPU (torch required)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def load_weights(model_params: dict, path: str) -> dict:
    """Replace matching entries of an initialized flax params tree with a
    reference checkpoint's weights (API parity with
    RefineDet.load_weights, refinedet.py:160-168)."""
    state = load_torch_checkpoint(path)
    keys = set(_strip_module_prefix(_as_numpy(state)).keys())
    if any(k.startswith("vgg.") for k in keys) or any(
            k.startswith("module.vgg.") for k in keys):
        imported = torch_state_dict_to_flax(state)
    else:
        imported = vgg16_reducedfc_to_flax(state)
    out = dict(model_params)
    for name, leaf in imported.items():
        if name in out:
            want = {k: np.asarray(v).shape for k, v in out[name].items()}
            got = {k: np.asarray(v).shape for k, v in leaf.items()}
            if want != got:
                raise ValueError(
                    f"shape mismatch importing {name}: {got} vs {want}")
        out[name] = leaf
    return out
