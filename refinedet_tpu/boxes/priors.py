"""Anchor (prior box) grid generation.

TPU-native counterpart of ``/root/reference/layers/functions/prior_box.py:7-56``.
Priors are a pure function of the static AnchorConfig, so we generate them once
in numpy at setup and embed them as a jit-time constant — no per-step compute.
The cell ordering (row-major (i, j), per-cell: min-size box, optional
geometric-mean box, then +/- sqrt(ar) pairs) matches the reference exactly so
that flattened head predictions align 1:1.
"""

from __future__ import annotations

import math

import numpy as np

from refinedet_tpu.config import AnchorConfig


def generate_priors(cfg: AnchorConfig) -> np.ndarray:
    """Return [num_priors, 4] float32 priors in center-size form, in [0, 1]."""
    out = []
    for k, f in enumerate(cfg.feature_maps):
        f_k = cfg.min_dim / cfg.steps[k]
        s_k = cfg.min_sizes[k] / cfg.min_dim

        cell_boxes = [(s_k, s_k)]
        if cfg.max_sizes:
            s_prime = math.sqrt(s_k * (cfg.max_sizes[k] / cfg.min_dim))
            cell_boxes.append((s_prime, s_prime))
        for ar in cfg.aspect_ratios[k]:
            r = math.sqrt(ar)
            cell_boxes.append((s_k * r, s_k / r))
            cell_boxes.append((s_k / r, s_k * r))
        cell_boxes = np.asarray(cell_boxes, dtype=np.float64)  # [A, 2]

        ij = np.arange(f, dtype=np.float64)
        cx = (ij[None, :, None] + 0.5) / f_k          # [1, f, 1] over j
        cy = (ij[:, None, None] + 0.5) / f_k          # [f, 1, 1] over i
        a = cell_boxes.shape[0]
        grid = np.empty((f, f, a, 4), dtype=np.float64)
        grid[..., 0] = np.broadcast_to(cx, (f, f, a))
        grid[..., 1] = np.broadcast_to(cy, (f, f, a))
        grid[..., 2] = cell_boxes[None, None, :, 0]
        grid[..., 3] = cell_boxes[None, None, :, 1]
        out.append(grid.reshape(-1, 4))

    priors = np.concatenate(out, axis=0).astype(np.float32)
    if cfg.clip:
        priors = np.clip(priors, 0.0, 1.0)
    assert priors.shape[0] == cfg.num_priors, (priors.shape, cfg.num_priors)
    return priors


class PriorBox:
    """API-parity shim mirroring the reference's ``PriorBox(cfg).forward()``."""

    def __init__(self, cfg: AnchorConfig):
        self.cfg = cfg

    def forward(self) -> np.ndarray:
        return generate_priors(self.cfg)

    __call__ = forward
