"""Second-order weight-rounding optimization for int8 PTQ (GPTQ-style).

Round-to-nearest treats every weight independently; the layer's actual
output error is ``E[((W - W_hat)^T x)^2] = dW^T H dW`` with
``H = E[x x^T]`` over im2col patches of the calibration stream — so the
optimal rounding of one weight depends on the rounding of the others
through the input covariance. This module implements the AdaRound-class
fix in its strongest deterministic form (Frantar et al., GPTQ / OBQ
lineage): quantize the K patch-dimensions of each conv kernel in order,
and after fixing each one, shift the still-unquantized rows to absorb
the rounding residual via the Cholesky factor of ``H^-1`` — layer-local,
label-free, runs at quantization time like bias correction. No reference
counterpart (the reference has no quantized path at all).

The solver is written in JAX (``lax.fori_loop`` of masked rank-1
updates) so the big layers (conv6: K = 9216, O = 1024 -> ~10^14 flops)
run in seconds on the TPU; the host only does one K x K inverse +
Cholesky per layer.

Hessians come from ``accumulate_hessians``: the model's 'calib_x' sow
captures each quantized conv's input feature map, and a per-layer jitted
``patches^T @ patches`` reduces it to ``H`` on device — only the
[K, K] matrix ever crosses to the host.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_INPUT_SUFFIX = "_input"


def conv_geometry(name: str, kernel_shape) -> tuple:
    """(kh, kw, stride, padding, dilation) of a quantizable RefineDet conv
    from its name + kernel shape (the module definitions in
    models/refinedet.py: conv6 is 3x3 pad 3 dilation 3, extra_conv2 is
    stride 2, 1x1 convs are pad 0, everything else 3x3 pad 1)."""
    kh, kw = int(kernel_shape[0]), int(kernel_shape[1])
    stride = 2 if name == "extra_conv2" else 1
    dilation = 3 if name == "vgg_conv6" else 1
    if name == "vgg_conv6":
        padding = 3
    else:
        padding = 0 if kh == 1 else 1
    return kh, kw, stride, padding, dilation


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _hessian_of(x, kh, kw, stride, padding, dilation):
    """H = patches^T @ patches over all positions of one batch, [K, K]
    f32 with K = cin*kh*kw in channel-major (c, kh, kw) order — the
    ordering conv_general_dilated_patches emits (pinned by
    tests/test_quant.py::test_patch_order_matches_conv)."""
    p = lax.conv_general_dilated_patches(
        x.astype(jnp.float32), (kh, kw), (stride, stride),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pm = p.reshape(-1, p.shape[-1])
    return pm.T @ pm, jnp.asarray(pm.shape[0], jnp.float32)


def accumulate_hessians(model, variables, batches: Iterable,
                        names: Optional[Sequence[str]] = None,
                        max_sub_batch: int = 4) -> Dict[str, np.ndarray]:
    """Per-quantized-conv im2col input Hessians ``E[x x^T]`` over the
    calibration stream. ``model`` is the f32/bf16 (non-quant) model whose
    'calib_x' sow captures conv inputs; ``batches`` yields preprocessed
    image arrays. Batches are split to ``max_sub_batch`` images per
    forward so the captured full-resolution feature maps stay bounded.
    Returns {conv_name: H [K, K] f32} normalized by total patch count."""

    @jax.jit
    def run(v, images):
        _, state = model.raw_forward(v, images, train=False,
                                     mutable=["calib", "calib_x"])
        return state["calib_x"]

    hs: Dict[str, np.ndarray] = {}
    counts: Dict[str, float] = {}
    n = 0
    for images in batches:
        images = np.asarray(images)
        for s0 in range(0, images.shape[0], max_sub_batch):
            sub = jnp.asarray(images[s0:s0 + max_sub_batch])
            captured = run(variables, sub)
            for key, x in captured.items():
                if not key.endswith(_INPUT_SUFFIX):
                    continue
                name = key[: -len(_INPUT_SUFFIX)]
                if names is not None and name not in names:
                    continue
                geom = conv_geometry(
                    name, _kernel_shape_for(variables, name))
                # Cross-check the name-inferred geometry against the one
                # the model sowed next to the capture (ADVICE r4: a future
                # quantizable conv with non-default stride/pad/dilation
                # must fail loudly here, not silently degrade GPTQ with a
                # mismatched Hessian).
                sown = captured.get(f"{name}_geom")
                if sown is not None:
                    k, s, p, d = (int(v) for v in np.asarray(
                        jax.device_get(sown)).reshape(-1))
                    if (k, k, s, p, d) != geom:
                        raise ValueError(
                            f"conv {name!r}: model geometry "
                            f"(kernel={k}, stride={s}, pad={p}, dil={d}) "
                            f"disagrees with quant.gptq.conv_geometry's "
                            f"table {geom}; update conv_geometry")
                h, cnt = _hessian_of(x, *geom)
                h = np.asarray(jax.device_get(h), np.float64)
                hs[name] = hs.get(name, 0.0) + h
                counts[name] = counts.get(name, 0.0) + float(cnt)
            n += 1
    if n == 0:
        raise ValueError("calibration stream was empty")
    return {name: (h / counts[name]).astype(np.float32)
            for name, h in hs.items()}


def _kernel_shape_for(variables, name: str) -> tuple:
    leaves = variables["params"].get(name)
    if leaves is not None and "kernel" in leaves:
        return np.shape(leaves["kernel"])
    # quantized template: kernel_q carries the same shape
    if leaves is not None and "kernel_q" in leaves:
        return np.shape(leaves["kernel_q"])
    raise KeyError(f"no kernel for conv {name!r}")


@jax.jit
def _gptq_solve(w_mat: jnp.ndarray, scale: jnp.ndarray,
                u_upper: jnp.ndarray) -> jnp.ndarray:
    """Ordered quantization with error feedback.

    ``w_mat`` [K, O] f32 (folded weights, channel-major patch order),
    ``scale`` [O] per-output-channel step, ``u_upper`` [K, K] the upper
    Cholesky factor of H^-1 (H^-1 = U^T U). Row k is rounded to the grid;
    its residual, scaled by ``U[k, k]``, shifts rows > k along ``U[k]``
    (the OBQ compensation). Returns the int8 grid indices [K, O]."""
    kdim = w_mat.shape[0]
    diag = jnp.diagonal(u_upper)
    rows = jnp.arange(kdim)

    def body(k, carry):
        w, q = carry
        w_k = lax.dynamic_slice_in_dim(w, k, 1, 0)[0]
        q_k = jnp.clip(jnp.round(w_k / scale), -127.0, 127.0)
        d = lax.dynamic_slice_in_dim(diag, k, 1, 0)[0]
        err = (w_k - q_k * scale) / d
        u_row = lax.dynamic_slice_in_dim(u_upper, k, 1, 0)[0]
        mask = (rows > k).astype(w.dtype)
        w = w - (u_row * mask)[:, None] * err[None, :]
        q = lax.dynamic_update_slice_in_dim(q, q_k[None], k, 0)
        return w, q

    _, q = lax.fori_loop(0, kdim, body, (w_mat, jnp.zeros_like(w_mat)))
    return q.astype(jnp.int8)


def gptq_round(w: np.ndarray, in_scale: np.ndarray, w_scale: np.ndarray,
               hessian: np.ndarray, percdamp: float = 0.01) -> np.ndarray:
    """Hessian-aware int8 rounding of one conv kernel.

    ``w`` [kh, kw, cin, cout] raw f32 weights, ``in_scale`` [cin] folded
    activation scales, ``w_scale`` [cout] weight steps (from the folded
    weights, same as round-to-nearest), ``hessian`` [K, K] from
    ``accumulate_hessians`` (RAW inputs; the in_scale fold is applied
    here). Returns kernel_q int8 [kh, kw, cin, cout] minimizing the
    calibration-stream output MSE under ordered elimination."""
    kh, kw, cin, cout = w.shape
    kdim = kh * kw * cin
    if hessian.shape != (kdim, kdim):
        raise ValueError(f"hessian shape {hessian.shape} != ({kdim},{kdim}) "
                         f"for kernel {w.shape}")
    w_folded = np.asarray(w, np.float32) * \
        np.asarray(in_scale, np.float32)[None, None, :, None]
    # channel-major (c, kh, kw) patch order — must match _hessian_of
    w_mat = w_folded.transpose(2, 0, 1, 3).reshape(kdim, cout)
    s_rep = np.repeat(np.asarray(in_scale, np.float64), kh * kw)
    h = np.asarray(hessian, np.float64) / (s_rep[:, None] * s_rep[None, :])

    # Dead patch-dimensions (never active on the calib stream): decouple
    # them (zero row/col, unit diagonal) so the factorization is defined,
    # the compensation never routes through them, and their own weights
    # fall back to plain round-to-nearest.
    dead = np.diagonal(h) <= 0.0
    if dead.any():
        h[dead, :] = 0.0
        h[:, dead] = 0.0
        h[dead, dead] = 1.0
    damp = percdamp * float(np.mean(np.diagonal(h)))
    h[np.arange(kdim), np.arange(kdim)] += damp

    h_inv = np.linalg.inv(h)
    # numpy cholesky: A = L L^T (lower); U = L^T gives H^-1 = U^T U
    u_upper = np.linalg.cholesky(h_inv).T.astype(np.float32)

    q = jax.device_get(_gptq_solve(
        jnp.asarray(w_mat), jnp.asarray(w_scale, jnp.float32),
        jnp.asarray(u_upper)))
    return np.asarray(q, np.int8).reshape(cin, kh, kw, cout) \
        .transpose(1, 2, 0, 3)
