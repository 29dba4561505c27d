"""RefineDet model (Flax, NHWC, TPU-first).

Re-design of the reference network (``/root/reference/models/refinedet.py``,
plus the BN variant ``refinedet_bn.py``) as a single Flax module:

  * VGG-16 trunk with ceil-mode pool3, 2x2-s2 pool5, dilated 3x3 conv6
    (dilation 3, 1024 ch) and 1x1 conv7 (refinedet.py:173-193);
  * L2Norm taps after conv4_3 (scale 10) and conv5_3 (scale 8)
    (refinedet.py:41-42, 85-92);
  * extras: 1x1 1024->256 then 3x3-s2 256->512 (refinedet.py:196-210);
  * ARM heads on the four backbone sources, ODM heads on the four 256-ch
    TCB outputs, 3 anchors/cell (refinedet.py:212-238);
  * TCB top-down fusion: per level conv-relu-conv, + deconv(2x2, s2) of the
    deeper level, then relu-conv-relu (refinedet.py:240-255, forward
    :114-129).

Everything is NHWC so convolutions tile directly onto the MXU; head outputs
flatten in (h, w, anchor) order, matching the reference's NCHW->NHWC permute
before flattening (refinedet.py:107-110), so checkpoints and priors align
1:1. The module is phase-free and returns raw head tensors; softmax/detection
live in refinedet_tpu.detect (build_refinedet wires them together).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from refinedet_tpu.models.layers import L2Norm, QuantConv, max_pool_2x2

# VGG-16 (conv layers only) — (name, out_channels); "M"/"C" are pools.
VGG_CFG = (
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "C",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
)

# Channels of the four ARM source feature maps (conv4_3, conv5_3, fc7, extra).
SOURCE_CHANNELS = (512, 512, 1024, 512)
TCB_CHANNELS = 256
ANCHORS_PER_CELL = 3

_he = nn.initializers.he_normal()
_xavier = nn.initializers.xavier_uniform()

# Percentiles of |input| recorded (besides the max) by the PTQ calibration
# sow; quant/ptq.py selects one as the activation clip point.
CALIB_PERCENTILES = (99.99, 99.9, 99.0)


class RefineDet(nn.Module):
    """RefineDet320/512 backbone + ARM/ODM heads + TCB fusion.

    Call returns (arm_loc [B,P,4], arm_conf [B,P,2], odm_loc [B,P,4],
    odm_conf [B,P,num_classes]) as raw logits in float32.
    """

    size: int = 320
    num_classes: int = 21
    use_bn: bool = False
    dtype: Any = jnp.float32
    # Int8 serving mode: quantizable convs become QuantConv (params filled
    # by quant/ptq.py). Heads, conv1_1, L2Norm and the TCB deconvs stay in
    # self.dtype — together <4% of the FLOPs, and the most
    # quantization-sensitive layers. ``quant_skip`` names additional convs
    # to keep unquantized (accuracy/speed knob).
    quant: bool = False
    quant_skip: Tuple[str, ...] = ()
    # Space-to-depth stem (inference-only serving transform): replaces
    # conv1_1/conv1_2/pool1 with their exact 2x2-blocked-layout
    # equivalents so the stem's activations carry 256 channels (full
    # 128-lane MXU fill vs 64-wide at 68%) and pool1 becomes a free
    # elementwise max over the four block phases instead of a 2.1 GB HBM
    # round trip. Weights are FOLDED from a standard checkpoint by
    # models/stem_s2d.fold_stem_variables — the two models are
    # numerically equivalent (tests/test_model.py). Costs 16/9 the stem
    # FLOPs (a 3x3 s1 conv in 2x2-blocked space touches 16 candidate
    # taps for 9 real ones). MEASURED NEGATIVE (tools/bench_stem_s2d.py,
    # b128 @320 on the real chip): 1718 vs 2020 img/s (0.851x) — the
    # structural overhead plus four phase convs each re-reading the
    # blocked 256-ch features cost more than the MXU fill + folded pool
    # save. Kept as a pinned negative result (like POOL_BACKWARD); the
    # default path stays with the standard stem.
    stem_s2d: bool = False

    def _conv(self, features, kernel, name, *, strides=1, padding=0,
              dilation=1, init=_he, quantizable=False):
        quantizable = quantizable and name not in self.quant_skip
        if quantizable and self.quant:
            return QuantConv(features=features, kernel=kernel,
                             strides=strides, padding=padding,
                             dilation=dilation, dtype=self.dtype, name=name)
        conv = nn.Conv(
            features=features,
            kernel_size=(kernel, kernel),
            strides=(strides, strides),
            padding=padding,
            kernel_dilation=(dilation, dilation),
            kernel_init=init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        if not quantizable:
            return conv

        def conv_with_calibration(x):
            # Record per-input-channel |x| max + high percentiles for PTQ
            # calibration (quant/ptq.py; per-channel scales fold into the
            # quantized weights, and percentile clipping defends against
            # activation outliers dominating the int8 scale). Gated on
            # 'calib' mutability so eager (un-jitted) forwards don't pay
            # ~24 full-feature-map sorts per call — under jit the gate is
            # redundant (DCE) but eager callers like demo.py are not.
            if not self.is_mutable_collection("calib"):
                return conv(x)
            cin = x.shape[-1]
            xf = x.astype(jnp.float32).reshape(-1, cin)
            ax = jnp.abs(xf)
            stats = jnp.concatenate([
                jnp.max(ax, axis=0)[None],
                jnp.percentile(ax, jnp.asarray(CALIB_PERCENTILES), axis=0),
            ]).astype(jnp.float32)  # [1 + P, cin]
            self.sow("calib", f"{name}_absstats", stats,
                     init_fn=lambda: jnp.zeros(
                         (1 + len(CALIB_PERCENTILES), cin), jnp.float32),
                     reduce_fn=jnp.maximum)
            # Signed per-channel mean E[x]: input to PTQ bias correction
            # (quant/ptq.py:bias_correction_delta). Each conv runs once
            # per forward, so the overwrite reduce never actually merges;
            # cross-batch averaging happens in calibrate_amax.
            self.sow("calib", f"{name}_mean", jnp.mean(xf, axis=0),
                     init_fn=lambda: jnp.zeros((cin,), jnp.float32),
                     reduce_fn=lambda prev, new: new)
            if self.is_mutable_collection("calib_x"):
                # Full input feature map: quant/gptq.py turns it into the
                # per-layer im2col Hessian E[x x^T] for second-order
                # weight-rounding optimization. Separate collection from
                # 'calib' so the (heavy) capture only happens when the
                # Hessian pass asks for it.
                self.sow("calib_x", f"{name}_input", x.astype(jnp.float32),
                         init_fn=lambda: jnp.zeros((), jnp.float32),
                         reduce_fn=lambda prev, new: new)
                # The conv's TRUE geometry, so the Hessian pass never has
                # to infer stride/pad/dilation from the layer name
                # (quant/gptq.py cross-checks its name-based table against
                # this and fails loudly on a mismatch instead of silently
                # building a wrong im2col Hessian).
                self.sow("calib_x", f"{name}_geom",
                         jnp.asarray([kernel, strides, padding, dilation],
                                     jnp.int32),
                         init_fn=lambda: jnp.zeros((4,), jnp.int32),
                         reduce_fn=lambda prev, new: new)
            return conv(x)

        return conv_with_calibration

    def _maybe_bn(self, x, name, train):
        if not self.use_bn:
            return x
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)(x)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        sources = []

        vgg_cfg = VGG_CFG
        if self.stem_s2d:
            if self.use_bn or self.quant:
                raise ValueError("stem_s2d is a plain-model serving "
                                 "transform (no BN/quant folding)")
            # conv1_1 as a 4x4/s2 conv emitting the 2x2-blocked layout of
            # its 320^2 x 64 output: channel group (di,dj) of the 256
            # outputs holds logical pixel (2i+di, 2j+dj). Exactly the
            # original conv (kernel rearranged with structured zeros by
            # fold_stem_variables); relu is blocked-layout-invariant.
            x = nn.Conv(features=4 * 64, kernel_size=(4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), kernel_init=_he,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        param_dtype=jnp.float32, name="stem_conv1")(x)
            x = nn.relu(x)
            # conv1_2 split into its four stride-2 phases, each a 2x2
            # blocked conv over the 256-ch layout; max over the phases IS
            # pool1 (pool commutes with the later relu: both are maxes).
            phases = []
            for di in (0, 1):
                for dj in (0, 1):
                    phases.append(nn.Conv(
                        features=64, kernel_size=(2, 2), strides=(1, 1),
                        padding=((1 - di, di), (1 - dj, dj)),
                        kernel_init=_he, bias_init=nn.initializers.zeros,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"stem_conv2_{di}{dj}")(x))
            x = phases[0]
            for ph in phases[1:]:
                x = jnp.maximum(x, ph)
            x = nn.relu(x)
            vgg_cfg = VGG_CFG[3:]  # conv1_1, conv1_2, pool1 consumed

        # --- VGG trunk ---
        for item in vgg_cfg:
            if item == "M":
                x = max_pool_2x2(x)
            elif item == "C":
                x = max_pool_2x2(x, ceil_mode=True)
            else:
                name, ch = item
                x = self._conv(ch, 3, f"vgg_{name}", padding=1,
                               quantizable=name != "conv1_1")(x)
                x = self._maybe_bn(x, f"vgg_{name}_bn", train)
                x = nn.relu(x)
                if name == "conv3_3" and self.size == 896:
                    # Five-source variant (refinedet_bn.py:56-59,108-112):
                    # an extra stride-4 source tapped at conv3_3
                    # (fm 224 = 896/4).
                    sources.append(
                        L2Norm(256, 10.0, dtype=self.dtype,
                               name="conv3_3_L2Norm")(x))
                if name == "conv4_3":
                    sources.append(
                        L2Norm(512, 10.0, dtype=self.dtype,
                               name="conv4_3_L2Norm")(x))
                elif name == "conv5_3":
                    sources.append(
                        L2Norm(512, 8.0, dtype=self.dtype,
                               name="conv5_3_L2Norm")(x))
        x = max_pool_2x2(x)  # pool5
        x = self._conv(1024, 3, "vgg_conv6", padding=3, dilation=3,
                       quantizable=True)(x)
        x = self._maybe_bn(x, "vgg_conv6_bn", train)
        x = nn.relu(x)
        x = self._conv(1024, 1, "vgg_conv7", quantizable=True)(x)
        x = self._maybe_bn(x, "vgg_conv7_bn", train)
        x = nn.relu(x)
        sources.append(x)

        # --- extras ---
        x = self._conv(256, 1, "extra_conv1", init=_xavier,
                       quantizable=True)(x)
        x = self._maybe_bn(x, "extra_conv1_bn", train)
        x = nn.relu(x)
        x = self._conv(512, 3, "extra_conv2", strides=2, padding=1,
                       init=_xavier, quantizable=True)(x)
        x = self._maybe_bn(x, "extra_conv2_bn", train)
        x = nn.relu(x)
        sources.append(x)

        # --- ARM heads over backbone sources ---
        arm_loc, arm_conf = [], []
        for i, s in enumerate(sources):
            loc = self._conv(ANCHORS_PER_CELL * 4, 3, f"arm_loc{i}",
                             padding=1, init=_xavier)(s)
            conf = self._conv(ANCHORS_PER_CELL * 2, 3, f"arm_conf{i}",
                              padding=1, init=_xavier)(s)
            arm_loc.append(loc.reshape(loc.shape[0], -1, 4))
            arm_conf.append(conf.reshape(conf.shape[0], -1, 2))

        # --- TCB top-down fusion ---
        num_levels = len(sources)
        tcb_feats = [None] * num_levels
        p = None
        for si in reversed(range(num_levels)):
            s = self._conv(TCB_CHANNELS, 3, f"tcb0_{si}_conv1", padding=1,
                           init=_xavier, quantizable=True)(sources[si])
            s = nn.relu(s)
            s = self._conv(TCB_CHANNELS, 3, f"tcb0_{si}_conv2", padding=1,
                           init=_xavier, quantizable=True)(s)
            if si != num_levels - 1:
                up = nn.ConvTranspose(
                    features=TCB_CHANNELS, kernel_size=(2, 2),
                    strides=(2, 2), padding="VALID", kernel_init=_xavier,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"tcb1_{si}_deconv")(p)
                s = s + up
            s = nn.relu(s)
            s = self._conv(TCB_CHANNELS, 3, f"tcb2_{si}_conv", padding=1,
                           init=_xavier, quantizable=True)(s)
            s = nn.relu(s)
            p = s
            tcb_feats[si] = s

        # --- ODM heads over TCB outputs ---
        odm_loc, odm_conf = [], []
        for i, s in enumerate(tcb_feats):
            loc = self._conv(ANCHORS_PER_CELL * 4, 3, f"odm_loc{i}",
                             padding=1, init=_xavier)(s)
            conf = self._conv(ANCHORS_PER_CELL * self.num_classes, 3,
                              f"odm_conf{i}", padding=1, init=_xavier)(s)
            odm_loc.append(loc.reshape(loc.shape[0], -1, 4))
            odm_conf.append(conf.reshape(conf.shape[0], -1, self.num_classes))

        cat = lambda xs: jnp.concatenate(xs, axis=1).astype(jnp.float32)
        return (cat(arm_loc), cat(arm_conf), cat(odm_loc), cat(odm_conf))


def expected_num_priors(size: int) -> int:
    fm = {320: (40, 20, 10, 5), 512: (64, 32, 16, 8),
          896: (224, 112, 56, 28, 14)}[size]
    return ANCHORS_PER_CELL * sum(f * f for f in fm)
