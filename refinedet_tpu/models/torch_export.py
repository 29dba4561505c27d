"""Reverse checkpoint interop: Flax params -> reference PyTorch state_dict.

Exact inverse of ``torch_import.py``: a TPU-trained checkpoint becomes a
``.pth`` file the reference loads verbatim —
``net.load_state_dict(torch.load(path), strict=True)`` with the module
naming of ``/root/reference/models/refinedet.py`` (plain) and
``refinedet_bn.py`` (BN variant), so reference users can fine-tune, eval,
or serve TPU-trained weights in their existing PyTorch stack. Round-trip
(export -> import) is bit-exact; strict-load + forward parity against the
actual reference nets is pinned in tests/test_torch_export.py.

Layout notes (mirror of the import direction):
  * conv kernels: flax HWIO [kh, kw, in, out] -> torch [out, in, kh, kw]
  * deconv kernels: flax ConvTranspose stores the spatially MIRRORED torch
    kernel (torch_import._deconv_kernel), so the export flips it back
  * BN: flax scale/bias -> torch weight/bias; batch_stats mean/var ->
    running_mean/running_var; ``num_batches_tracked`` (present in every
    torch BatchNorm2d state_dict, required by strict=True) is emitted as 0
    — torch only consults it when momentum=None, which the reference never
    uses (refinedet_bn.py builds stock BatchNorm2d, momentum default 0.1).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

from refinedet_tpu.models.torch_import import BN_VGG_CONV_IDX, VGG_CONV_IDX


def _np32(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _conv_kernel_to_torch(k) -> np.ndarray:
    """flax HWIO [kh, kw, in, out] -> torch Conv2d [out, in, kh, kw]."""
    return np.ascontiguousarray(np.transpose(_np32(k), (3, 2, 0, 1)))


def _deconv_kernel_to_torch(k) -> np.ndarray:
    """flax ConvTranspose HWIO -> torch ConvTranspose2d [in, out, kh, kw].

    Inverse of torch_import._deconv_kernel: transpose back, then un-mirror
    the spatial dims."""
    w = np.transpose(_np32(k), (2, 3, 0, 1))
    return np.ascontiguousarray(w[:, :, ::-1, ::-1])


def _num_sources(params: Mapping) -> int:
    return 5 if "arm_loc4" in params else 4


def flax_to_torch_state_dict(params: Mapping,
                             num_sources: Optional[int] = None
                             ) -> Dict[str, np.ndarray]:
    """Plain-variant export (models/refinedet.py naming): the inverse of
    torch_import.torch_state_dict_to_flax."""
    num_sources = num_sources or _num_sources(params)
    state: Dict[str, np.ndarray] = {}

    def put_conv(torch_name, flax_name, deconv=False):
        leaf = params[flax_name]
        to_torch = _deconv_kernel_to_torch if deconv else _conv_kernel_to_torch
        state[torch_name + ".weight"] = to_torch(leaf["kernel"])
        state[torch_name + ".bias"] = _np32(leaf["bias"])

    for idx, name in VGG_CONV_IDX.items():
        put_conv(f"vgg.{idx}", f"vgg_{name}")
    for norm in ("conv4_3_L2Norm", "conv5_3_L2Norm"):
        state[norm + ".weight"] = _np32(params[norm]["weight"])
    put_conv("extras.0", "extra_conv1")
    put_conv("extras.1", "extra_conv2")
    for i in range(num_sources):
        put_conv(f"arm_loc.{i}", f"arm_loc{i}")
        put_conv(f"arm_conf.{i}", f"arm_conf{i}")
        put_conv(f"odm_loc.{i}", f"odm_loc{i}")
        put_conv(f"odm_conf.{i}", f"odm_conf{i}")
        put_conv(f"tcb0.{3 * i}", f"tcb0_{i}_conv1")
        put_conv(f"tcb0.{3 * i + 2}", f"tcb0_{i}_conv2")
        put_conv(f"tcb2.{3 * i + 1}", f"tcb2_{i}_conv")
        if i < num_sources - 1:
            put_conv(f"tcb1.{i}", f"tcb1_{i}_deconv", deconv=True)
    return state


def flax_to_torch_state_dict_bn(variables: Mapping,
                                num_sources: Optional[int] = None
                                ) -> Dict[str, np.ndarray]:
    """BN-variant export (refinedet_bn.py naming, backbone_dict=dict(bn=
    True)): the inverse of torch_import.torch_state_dict_to_flax_bn.
    ``variables`` = {"params": ..., "batch_stats": ...}."""
    params = variables["params"]
    stats = variables.get("batch_stats") or {}
    num_sources = num_sources or _num_sources(params)
    state: Dict[str, np.ndarray] = {}

    def put_conv(torch_name, flax_name, deconv=False):
        leaf = params[flax_name]
        to_torch = _deconv_kernel_to_torch if deconv else _conv_kernel_to_torch
        state[torch_name + ".weight"] = to_torch(leaf["kernel"])
        state[torch_name + ".bias"] = _np32(leaf["bias"])

    def put_bn(torch_name, flax_name):
        state[torch_name + ".weight"] = _np32(params[flax_name]["scale"])
        state[torch_name + ".bias"] = _np32(params[flax_name]["bias"])
        state[torch_name + ".running_mean"] = _np32(
            stats[flax_name]["mean"])
        state[torch_name + ".running_var"] = _np32(stats[flax_name]["var"])
        state[torch_name + ".num_batches_tracked"] = np.asarray(0, np.int64)

    for idx, name in BN_VGG_CONV_IDX.items():
        put_conv(f"vgg.{idx}", f"vgg_{name}")
        put_bn(f"vgg.{idx + 1}", f"vgg_{name}_bn")
    for norm in ("conv4_3_L2Norm", "conv5_3_L2Norm", "conv3_3_L2Norm"):
        if norm in params:
            state[norm + ".weight"] = _np32(params[norm]["weight"])
    put_conv("extras.0", "extra_conv1")
    put_bn("extras.1", "extra_conv1_bn")
    put_conv("extras.3", "extra_conv2")
    put_bn("extras.4", "extra_conv2_bn")
    for i in range(num_sources):
        put_conv(f"arm_loc.{i}", f"arm_loc{i}")
        put_conv(f"arm_conf.{i}", f"arm_conf{i}")
        put_conv(f"odm_loc.{i}", f"odm_loc{i}")
        put_conv(f"odm_conf.{i}", f"odm_conf{i}")
        put_conv(f"tcb0.{3 * i}", f"tcb0_{i}_conv1")
        put_conv(f"tcb0.{3 * i + 2}", f"tcb0_{i}_conv2")
        put_conv(f"tcb2.{3 * i + 1}", f"tcb2_{i}_conv")
        if i < num_sources - 1:
            put_conv(f"tcb1.{i}", f"tcb1_{i}_deconv", deconv=True)
    return state


def save_torch_checkpoint(variables: Mapping, path: str,
                          use_bn: bool = False) -> str:
    """Write a reference-loadable ``.pth``. ``variables`` may be a bare
    params tree (plain variant) or {"params", "batch_stats"} (either
    variant; BN requires the stats)."""
    import torch

    if "params" in variables:
        params, var_tree = variables["params"], variables
    else:
        params, var_tree = variables, {"params": variables}
    if use_bn:
        state = flax_to_torch_state_dict_bn(var_tree)
    else:
        state = flax_to_torch_state_dict(params)
    torch.save({k: torch.from_numpy(np.array(v))  # copy: keep it writable
                for k, v in state.items()}, path)
    return path
