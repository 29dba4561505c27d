"""The jitted RefineDet training step (pjit/SPMD over the data mesh).

TPU-native counterpart of the reference's hot loop
(``/root/reference/train_refinedet.py:215-275``): one fused XLA program per
step — forward, ARM + ODM matching/losses, backward, SGD+momentum+weight
decay update, all inside jit with the batch sharded over the mesh's 'data'
axis and parameters replicated. XLA SPMD inserts the gradient all-reduce
over ICI (replacing DataParallel's scatter/gather).

Optimizer semantics mirror torch.optim.SGD(momentum=0.9, weight_decay=5e-4)
(train_refinedet.py:179-180): decay is added to the gradient before the
momentum buffer update.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from refinedet_tpu.config import AnchorConfig, TrainConfig
from refinedet_tpu.losses.multibox import refinedet_multibox_loss
from refinedet_tpu.parallel.mesh import (batch_sharding, image_sharding,
                                         replicated_sharding)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None  # BN variant only
    ema_params: Any = None   # ema_decay > 0 only (serving-side weights)


def make_optimizer(lr_schedule, momentum: float = 0.9,
                   weight_decay: float = 5e-4,
                   grad_clip_norm: float = 0.0
                   ) -> optax.GradientTransformation:
    """torch-SGD-equivalent: grad += wd * param; buf = m*buf + grad;
    param -= lr * buf.

    ``grad_clip_norm`` > 0 prepends global-norm clipping — not in the
    reference (which relies on pretrained-VGG warm starts for stability),
    but necessary for from-scratch runs at reference learning rates.
    """
    steps = []
    if grad_clip_norm and grad_clip_norm > 0:
        steps.append(optax.clip_by_global_norm(grad_clip_norm))
    steps += [
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_schedule),
    ]
    return optax.chain(*steps)


def create_train_state(model, rng, tx: optax.GradientTransformation,
                       batch_size: int = 1, ema: bool = False) -> TrainState:
    variables = model.init(rng, batch_size=batch_size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    ema_params = jax.tree.map(jnp.copy, params) if ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), batch_stats=batch_stats,
                      ema_params=ema_params)


def make_train_step(model, tx: optax.GradientTransformation,
                    train_cfg: TrainConfig,
                    mesh=None,
                    on_device_augment: bool = False,
                    augment_mean=None) -> Callable:
    """Build the jitted step: (state, images, boxes, labels, valid) ->
    (state, metrics).

    ``model`` is a RefineDetModel (models/builder.py); its AnchorConfig
    supplies priors/variances/num_classes. With ``mesh`` given, inputs are
    constrained to batch sharding and state to replication.

    With ``on_device_augment=True`` the SSD augmentation chain
    (data/augment_jax.py) runs inside the same jit, fused ahead of the
    forward pass: inputs are then host-staged raw-scale images + absolute
    staging-pixel boxes, and the per-step PRNG key is derived from
    (seed, state.step) so the step stays a pure function of its inputs.
    """
    cfg: AnchorConfig = model.cfg
    priors = model.priors
    use_bn = model.use_bn
    ema_decay = float(getattr(train_cfg, "ema_decay", 0.0))
    mean = tuple(augment_mean) if augment_mean is not None else (
        104.0, 117.0, 123.0)
    base_key = jax.random.PRNGKey(train_cfg.seed)

    def loss_fn(params, batch_stats, images, boxes, labels, valid):
        variables = {"params": params}
        if use_bn:
            variables["batch_stats"] = batch_stats
            (heads, mutated) = model.module.apply(
                variables, images, train=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            heads = model.module.apply(variables, images, train=True)
            new_stats = batch_stats
        preds = (*heads, priors)
        arm = refinedet_multibox_loss(
            preds, boxes, labels, valid, num_classes=2, use_arm=False,
            variances=cfg.variance, overlap_thresh=train_cfg.overlap_thresh,
            negpos_ratio=train_cfg.negpos_ratio, theta=train_cfg.theta)
        odm = refinedet_multibox_loss(
            preds, boxes, labels, valid, num_classes=cfg.num_classes,
            use_arm=True, variances=cfg.variance,
            overlap_thresh=train_cfg.overlap_thresh,
            negpos_ratio=train_cfg.negpos_ratio, theta=train_cfg.theta)
        loss = arm.loss_l + arm.loss_c + odm.loss_l + odm.loss_c
        metrics = {
            "loss": loss,
            "arm_loss_l": arm.loss_l, "arm_loss_c": arm.loss_c,
            "odm_loss_l": odm.loss_l, "odm_loss_c": odm.loss_c,
            "num_pos_arm": arm.num_pos, "num_pos_odm": odm.num_pos,
        }
        return loss, (metrics, new_stats)

    def step(state: TrainState, images, boxes, labels, valid):
        if on_device_augment:
            from refinedet_tpu.data.augment_jax import augment_batch
            key = jax.random.fold_in(base_key, state.step)
            images, boxes, valid = augment_batch(
                images, boxes, valid, key, out_size=model.size, mean=mean)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, images, boxes, labels, valid)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay > 0:
            # Serving-side EMA (beyond-reference; the reference ships raw
            # SGD weights). Warmup-ramped decay min(d, (1+t)/(10+t)) — the
            # TF-OD-API schedule — so early steps track the fast-moving
            # params instead of the random init; t is the post-update step
            # count, making the EMA after step 1 a pure function of the
            # first update rather than 90%+ random init.
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt,
                                  batch_stats=new_stats,
                                  ema_params=new_ema)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    # Images may additionally be sharded along H over a 'space' mesh axis
    # (spatial parallelism for very large inputs); XLA SPMD inserts the
    # conv halo exchanges and re-gathers at the flattened-head boundary.
    img = image_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, img, data, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
