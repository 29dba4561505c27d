"""Space-to-depth stem weight folding (TPU serving transform).

Converts a standard RefineDet checkpoint into the parameters of the
``stem_s2d=True`` model, which computes conv1_1 / conv1_2 / pool1 in a
2x2-blocked spatial layout (see RefineDet.stem_s2d for the rationale —
this has no reference counterpart; the reference's CUDA stem is just
cuDNN convs, ``/root/reference/models/refinedet.py:173-178``).

Derivation (rows shown; columns are identical with dj/b/f):

* conv1_1 (3x3/s1, pad 1) emitting blocked output: output block i,
  phase di, taps logical rows ``2i+di-1 .. 2i+di+1``. A 4x4/s2 conv with
  pad 1 sees rows ``2i-1 .. 2i+2`` at kernel index ``a``; matching terms
  gives ``K1[a, b, cin, (di,dj,c)] = W1[a-di, b-dj, cin, c]`` wherever
  ``0 <= a-di <= 2`` (zero elsewhere — 16/9 structural FLOP overhead).

* conv1_2 (3x3/s1, pad 1) + pool1 (2x2/s2): pooled output (i, j) is the
  max of conv1_2 at the four phases (2i+di, 2j+dj). Each phase is a 2x2
  conv over the blocked features: with pad (1-di, di), block tap ``a``
  covers logical row ``2(i - (1-di) + a) + e``, so the tap matches
  kernel row ``u+1`` where ``u = 2a + e - 2 + di`` (valid when
  ``0 <= u+1 <= 2``). ``max`` over the four phase outputs is exactly
  pool1, and commutes with the subsequent relu (both are maxes).

Blocked channel order everywhere: ``(e*2 + f)*C + c`` (position-major),
consistent between conv1_1's output groups and conv1_2's input taps.
"""

from __future__ import annotations

import numpy as np


def _unfreeze(tree):
    if isinstance(tree, dict):
        return {k: _unfreeze(v) for k, v in tree.items()}
    try:  # FrozenDict
        items = tree.items()
    except AttributeError:
        return tree
    return {k: _unfreeze(v) for k, v in items}


def fold_stem_params(params: dict) -> dict:
    """Fold a standard params tree (``vgg_conv1_1``/``vgg_conv1_2``) into
    the ``stem_s2d`` layout (``stem_conv1``/``stem_conv2_{di}{dj}``).
    Returns a new dict; all other entries pass through unchanged."""
    p = _unfreeze(params)
    c11 = p.pop("vgg_conv1_1")
    c12 = p.pop("vgg_conv1_2")
    w1 = np.asarray(c11["kernel"], np.float32)  # [3,3,3,C] HWIO
    b1 = np.asarray(c11["bias"], np.float32)
    w2 = np.asarray(c12["kernel"], np.float32)  # [3,3,C,C]
    b2 = np.asarray(c12["bias"], np.float32)
    if w1.shape[:2] != (3, 3) or w2.shape[:2] != (3, 3):
        raise ValueError(f"expected 3x3 stem kernels, got {w1.shape} / "
                         f"{w2.shape}")
    cin, c = w1.shape[2], w1.shape[3]

    # conv1_1 -> 4x4/s2, cin -> 4C, output channel group (di,dj,c)
    k1 = np.zeros((4, 4, cin, 4 * c), np.float32)
    b1b = np.zeros(4 * c, np.float32)
    for di in (0, 1):
        for dj in (0, 1):
            grp = slice((di * 2 + dj) * c, (di * 2 + dj + 1) * c)
            k1[di:di + 3, dj:dj + 3, :, grp] = w1
            b1b[grp] = b1
    p["stem_conv1"] = {"kernel": k1, "bias": b1b}

    # conv1_2 -> four 2x2 phase convs over the blocked (e,f,cin) channels
    for di in (0, 1):
        for dj in (0, 1):
            k = np.zeros((2, 2, 4 * c, c), np.float32)
            for a in (0, 1):
                for e in (0, 1):
                    u = 2 * a + e - 2 + di
                    if not 0 <= u + 1 <= 2:
                        continue
                    for b in (0, 1):
                        for f in (0, 1):
                            v = 2 * b + f - 2 + dj
                            if not 0 <= v + 1 <= 2:
                                continue
                            grp = slice((e * 2 + f) * c, (e * 2 + f + 1) * c)
                            k[a, b, grp, :] = w2[u + 1, v + 1]
            p[f"stem_conv2_{di}{dj}"] = {"kernel": k, "bias": b2.copy()}
    return p


def fold_stem_variables(variables) -> dict:
    """Fold a full ``model.init``-style variables tree ({'params': ...})."""
    out = _unfreeze(variables)
    out["params"] = fold_stem_params(out["params"])
    return out
