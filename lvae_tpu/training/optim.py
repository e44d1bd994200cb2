"""Optimizer construction + the jitted data-parallel train step.

Design (TPU-first re-design of reference lvae/trainer.py:176-223, 325-406):
  * 3 parameter groups (weights / bias / other) by pytree path; weight decay
    is L2-into-gradient on the weights group only, matching torch semantics
  * learning rate is a scalar INPUT to the step (host computes the schedule),
    so one compiled program serves the whole run
  * gradient clip by global norm + the reference's median-spike LR cut
    (grad_norm > 10x moving median -> 0.1x LR for this step, no EMA update)
  * gradient accumulation via an in-state accumulator (lax.cond apply)
  * EMA lives in the train state (replicated), decay passed as scalar
"""
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.struct


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    grad_accum: Any
    accum_count: jnp.ndarray          # int32 scalar
    ema_params: Any                   # None when EMA disabled
    step: jnp.ndarray                 # int32 scalar


def param_group_label(path_tuple) -> str:
    """weights / bn-bias / other, by parameter name
    (reference: trainer.py:180-199)."""
    last = str(path_tuple[-1])
    if 'bias' in last or last.startswith('bn'):
        return 'bias'
    if 'kernel' in last or 'weight' in last or last == 'embedding':
        return 'weights'
    return 'other'


def weights_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: param_group_label(
            tuple(getattr(k, 'key', getattr(k, 'idx', k)) for k in path)) == 'weights',
        params)


def build_transform(optimizer: str):
    """Direction transform without LR (LR applied in the step)."""
    if optimizer == 'adam':
        return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    if optimizer == 'adamax':
        return optax.scale_by_adamax(b1=0.9, b2=0.999, eps=1e-8)
    if optimizer == 'sgd':
        return optax.trace(decay=0.9)
    raise ValueError(f'Unknown optimizer: {optimizer}')


def create_train_state(params, optimizer='adam', ema=True):
    tx = build_transform(optimizer)
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        grad_accum=zeros,
        accum_count=jnp.zeros((), jnp.int32),
        # a real copy: EMA must not alias params (donation would see the
        # same buffer twice)
        ema_params=jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        if ema else None,
        step=jnp.zeros((), jnp.int32),
    ), tx


def make_train_step(loss_fn, tx, accum_num=1, grad_clip=2.0, wdecay=0.0,
                    use_ema=True):
    """Build the jitted train step.

    loss_fn(params, batch, rng) -> (loss, stats_dict)
    step(state, batch, rng, lr, grad_median, ema_decay) -> (state, metrics)
    """

    def train_step(state: TrainState, batch, rng, lr, grad_median, ema_decay):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True)(state.params)

        grad_accum = jax.tree.map(lambda a, g: a + g / accum_num,
                                  state.grad_accum, grads)
        accum_count = state.accum_count + 1
        do_update = accum_count >= accum_num

        def apply_update(args):
            grad_accum, opt_state, params, ema_params = args
            gnorm = optax.global_norm(grad_accum)
            # non-finite guard: a single overflowed bf16 forward (or inf
            # grad) must not poison 93M params — NaN survives any clip
            # scale (NaN*s = NaN). Zero the gradients and the effective LR
            # for this step: params/EMA stay bitwise put, Adam moments take
            # one harmless zero-grad decay, and training continues. The
            # host tolerates a bounded streak of these (trainer.consume)
            # instead of aborting on first sight — the r5-mixed40k 40k-step
            # run died at step 6162 exactly this way.
            ok = jnp.isfinite(gnorm)
            scale = jnp.where(
                ok, jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12)),
                0.0)
            # clip by global norm (reference: trainer.py:395) — RAW gradients,
            # before weight decay, matching clip_grad_norm_ + torch Adam
            # (decay applied inside the optimizer step, after clipping)
            clipped = jax.tree.map(
                lambda g: jnp.where(ok, g, 0.0) * scale, grad_accum)
            if wdecay > 0:
                mask = weights_mask(params)
                clipped = jax.tree.map(
                    lambda g, p, m: g + wdecay * p if m else g,
                    clipped, params, mask)
            # median-spike LR cut (reference: trainer.py:394-406)
            spike = gnorm > grad_median * 10.0
            lr_eff = jnp.where(ok, jnp.where(spike, lr * 0.1, lr), 0.0)
            updates, opt_state = tx.update(clipped, opt_state, params)
            params = jax.tree.map(lambda p, u: p - lr_eff * u, params, updates)
            if use_ema:
                # skip EMA update on spike/skipped steps (reference:
                # trainer.py:374); d=1 leaves ema_params bitwise unchanged
                d = jnp.where(spike | ~ok, 1.0, ema_decay)
                ema_params = jax.tree.map(
                    lambda e, p: e * d + p * (1.0 - d), ema_params, params)
            zeros = jax.tree.map(jnp.zeros_like, grad_accum)
            return zeros, opt_state, params, ema_params, gnorm

        def skip_update(args):
            grad_accum, opt_state, params, ema_params = args
            return (grad_accum, opt_state, params, ema_params,
                    optax.global_norm(grad_accum) * accum_num)

        ema = state.ema_params if use_ema else state.params
        grad_accum, opt_state, params, ema, gnorm = jax.lax.cond(
            do_update, apply_update, skip_update,
            (grad_accum, state.opt_state, state.params, ema))

        new_state = state.replace(
            params=params, opt_state=opt_state,
            grad_accum=grad_accum,
            accum_count=jnp.where(do_update, 0, accum_count),
            ema_params=ema if use_ema else None,
            step=state.step + 1)
        metrics = dict(stats)
        metrics['grad_norm'] = gnorm
        return new_state, metrics

    return train_step
