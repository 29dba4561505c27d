"""Minimal PyTorch RefineDet mirror (CPU-only, benchmarking + interop tests).

This is NOT part of the TPU framework's compute path. It exists to
(a) measure the PyTorch-CPU baseline that BASELINE.json's ">=10x throughput"
target is defined against, and (b) generate reference-shaped ``state_dict``s
(same key names as the reference implementation: ``vgg.N.*``, ``extras.N.*``,
``arm_loc.N.*``, ``odm_conf.N.*``, ``tcb{0,1,2}.N.*``, ``conv4_3_L2Norm``)
so the torch->JAX checkpoint importer (refinedet_tpu/models/torch_import.py)
can be tested without the original trained weights.

Architecture per the RefineDet paper (arXiv:1711.06897) and the reference's
layer tables (/root/reference/models/refinedet.py:257-275): VGG-16 trunk with
dilated conv6 + conv7, two L2Norm taps, one extra stage, ARM/ODM heads with
3 anchors/cell, and TCB top-down fusion.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

VGG_CHANNELS = [64, 64, "M", 128, 128, "M", 256, 256, 256, "C",
                512, 512, 512, "M", 512, 512, 512]
SRC_CH = [512, 512, 1024, 512]


class L2Norm(nn.Module):
    def __init__(self, channels, scale):
        super().__init__()
        self.weight = nn.Parameter(torch.full((channels,), float(scale)))

    def forward(self, x):
        norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
        return self.weight.view(1, -1, 1, 1) * x / norm


def _vgg_layers():
    layers, c_in = [], 3
    for v in VGG_CHANNELS:
        if v in ("M", "C"):
            layers.append(nn.MaxPool2d(2, 2, ceil_mode=(v == "C")))
        else:
            layers += [nn.Conv2d(c_in, v, 3, padding=1),
                       nn.ReLU(inplace=True)]
            c_in = v
    layers += [nn.MaxPool2d(2, 2),
               nn.Conv2d(512, 1024, 3, padding=3, dilation=3),
               nn.ReLU(inplace=True),
               nn.Conv2d(1024, 1024, 1),
               nn.ReLU(inplace=True)]
    return layers


class TorchRefineDet(nn.Module):
    """Train-phase forward only: returns (arm_loc, arm_conf, odm_loc,
    odm_conf) flattened like the reference (NCHW -> NHWC -> flat)."""

    def __init__(self, size=320, num_classes=21):
        super().__init__()
        self.size = size
        self.num_classes = num_classes
        self.vgg = nn.ModuleList(_vgg_layers())
        self.conv4_3_L2Norm = L2Norm(512, 10)
        self.conv5_3_L2Norm = L2Norm(512, 8)
        self.extras = nn.ModuleList([
            nn.Conv2d(1024, 256, 1),
            nn.Conv2d(256, 512, 3, stride=2, padding=1)])
        self.arm_loc = nn.ModuleList(
            [nn.Conv2d(c, 3 * 4, 3, padding=1) for c in SRC_CH])
        self.arm_conf = nn.ModuleList(
            [nn.Conv2d(c, 3 * 2, 3, padding=1) for c in SRC_CH])
        self.odm_loc = nn.ModuleList(
            [nn.Conv2d(256, 3 * 4, 3, padding=1) for _ in SRC_CH])
        self.odm_conf = nn.ModuleList(
            [nn.Conv2d(256, 3 * num_classes, 3, padding=1)
             for _ in SRC_CH])
        tcb0 = []
        for c in SRC_CH:
            tcb0 += [nn.Conv2d(c, 256, 3, padding=1), nn.ReLU(inplace=True),
                     nn.Conv2d(256, 256, 3, padding=1)]
        self.tcb0 = nn.ModuleList(tcb0)
        self.tcb1 = nn.ModuleList(
            [nn.ConvTranspose2d(256, 256, 2, 2) for _ in range(3)])
        tcb2 = []
        for _ in SRC_CH:
            tcb2 += [nn.ReLU(inplace=True), nn.Conv2d(256, 256, 3, padding=1),
                     nn.ReLU(inplace=True)]
        self.tcb2 = nn.ModuleList(tcb2)

    def forward(self, x):
        sources = []
        for k, layer in enumerate(self.vgg):
            x = layer(x)
            if k == 22:
                sources.append(self.conv4_3_L2Norm(x))
            elif k == 29:
                sources.append(self.conv5_3_L2Norm(x))
        sources.append(x)  # fc7
        x = F.relu(self.extras[0](x), inplace=True)
        x = F.relu(self.extras[1](x), inplace=True)
        sources.append(x)

        def heads(mods, feats, ch):
            outs = [m(f).permute(0, 2, 3, 1).reshape(f.shape[0], -1, ch)
                    for m, f in zip(mods, feats)]
            return torch.cat(outs, 1)

        arm_loc = heads(self.arm_loc, sources, 4)
        arm_conf = heads(self.arm_conf, sources, 2)

        tcb_feats = [None] * 4
        p = None
        for si in range(3, -1, -1):
            s = self.tcb0[si * 3](sources[si])
            s = self.tcb0[si * 3 + 1](s)
            s = self.tcb0[si * 3 + 2](s)
            if si != 3:
                s = s + self.tcb1[si](p)
            s = self.tcb2[si * 3](s)
            s = self.tcb2[si * 3 + 1](s)
            s = self.tcb2[si * 3 + 2](s)
            p = s
            tcb_feats[si] = s

        odm_loc = heads(self.odm_loc, tcb_feats, 4)
        odm_conf = heads(self.odm_conf, tcb_feats, self.num_classes)
        return arm_loc, arm_conf, odm_loc, odm_conf
