"""Pallas NMS kernel vs the XLA reference implementation and numpy oracle.

Runs in interpret mode on the CPU test platform; the compiled path is
exercised on real TPU by bench/eval runs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from refinedet_tpu.ops import nms
from refinedet_tpu.ops.nms_pallas import nms_pallas
from oracles import np_greedy_nms
from test_boxes import random_boxes


def _dets(rng, n, scale=300.0):
    boxes = random_boxes(rng, n, scale=scale)
    scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("plus_one", [False, True])
def test_pallas_matches_oracle(rng, plus_one):
    for _ in range(3):
        boxes, scores = _dets(rng, 200)
        res = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.45,
                         top_k=256, plus_one=plus_one, interpret=True)
        got = sorted(np.asarray(res.indices)[np.asarray(res.keep)].tolist())
        dets = np.hstack([boxes, scores[:, None]])
        want = sorted(np_greedy_nms(dets, 0.45, plus_one=plus_one))
        assert got == want


def test_pallas_matches_xla_batched(rng):
    boxes = np.stack([random_boxes(rng, 128, 300.0) for _ in range(6)])
    scores = rng.uniform(0, 1, (6, 128)).astype(np.float32)
    res_p = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                       top_k=128, interpret=True)
    for g in range(6):
        res_x = nms(jnp.asarray(boxes[g]), jnp.asarray(scores[g]), 0.5,
                    top_k=128)
        kept_p = set(np.asarray(res_p.indices[g])[np.asarray(res_p.keep[g])]
                     .tolist())
        kept_x = set(np.asarray(res_x.indices)[np.asarray(res_x.keep)]
                     .tolist())
        assert kept_p == kept_x


def test_pallas_score_thresh_and_padding(rng):
    boxes, scores = _dets(rng, 100)  # N=100 < K=128: padding path
    scores[:40] = 0.001
    res = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.45,
                     top_k=128, score_thresh=0.01, interpret=True)
    kept = np.asarray(res.indices)[np.asarray(res.keep)]
    assert (kept >= 40).all()
    assert res.keep.shape == (128,)
