"""Functional train state + the pjit-compiled train step.

This is the TPU-native replacement for the reference's mmcv-runner hot loop
(reference ``apis/train.py:194`` → ``train_step`` → OptimizerHook backward):
one pure function ``(state, batch, rng) -> (state, logs)`` compiled once by
XLA and executed per iteration, with the gradient all-reduce inserted
automatically by pjit over the data-sharded batch (≙ DDP/NCCL allreduce,
SURVEY.md §2.9).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    """Carries everything that evolves during training (a pytree)."""
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation):
        params = variables['params']
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params))

    @property
    def variables(self) -> dict:
        v = {'params': self.params}
        if self.batch_stats:
            v['batch_stats'] = self.batch_stats
        return v


def total_loss_from_dict(losses: dict):
    """Sum every ``*loss*`` entry (reference ``base.py:171`` _parse_losses).

    Non-loss entries (acc_seg) are logged but excluded from the gradient.
    """
    log_vars = {}
    for name, value in losses.items():
        if isinstance(value, (list, tuple)):
            log_vars[name] = sum(jnp.mean(v) for v in value)
        else:
            log_vars[name] = jnp.mean(value)
    total = sum(v for k, v in log_vars.items() if 'loss' in k)
    log_vars['loss'] = total
    return total, log_vars


def make_train_step(segmentor, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    data_axes: Any = None,
                    donate: bool = True,
                    compute_dtype: Any = None,
                    remat: bool = False) -> Callable:
    """Build the compiled train step for a segmentor wrapper.

    Args:
        segmentor: BaseSegmentor subclass exposing
            ``compute_losses(variables, img, gt, rng, train=True)``.
        tx: optax transformation (lr schedule already composed in).
        mesh: optional device mesh; batch is sharded over its 'data' axis and
            the state replicated — XLA then emits the gradient psum over ICI.
        data_axes: PartitionSpec for the batch (default ``P('data')`` over
            the leading axis).
        compute_dtype: cast the input batch (e.g. ``jnp.bfloat16``) — the
            TPU-native ≙ of the reference's ``@auto_fp16`` (``base.py:96``);
            activations follow the input dtype while params, BN statistics
            and losses stay fp32 (≙ ``@force_fp32``, ``decode_head.py:261``).
            bf16 needs no loss scaling.
        remat: rematerialise the forward during backward
            (``jax.checkpoint`` over the whole loss fn) — trades ~30% more
            FLOPs for activation memory, the ≙ of the reference's
            ``with_cp`` checkpointing.

    Returns:
        ``step(state, img, gt, rng) -> (state, log_vars)`` jit-compiled,
        state buffers donated.
    """

    def step(state: TrainState, img, gt, rng):
        rng = jax.random.fold_in(rng, state.step)
        if compute_dtype is not None:
            img = img.astype(compute_dtype)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            losses, new_model_state = segmentor.compute_losses(
                variables, img, gt, rng, train=True)
            total, log_vars = total_loss_from_dict(losses)
            return total, (log_vars, new_model_state)

        if remat:
            loss_fn = jax.checkpoint(loss_fn)

        grads, (log_vars, new_model_state) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_model_state.get('batch_stats',
                                            state.batch_stats),
            opt_state=new_opt_state)
        return new_state, log_vars

    if mesh is not None and mesh.devices.size > 1:
        # a 1-device mesh adds nothing (no collective to insert) but forces
        # the SPMD partitioner + per-call resharding — measured 20x slower
        # than plain jit on the tunneled single-chip platform. Engage the
        # sharded path only when there is actually more than one device.
        if data_axes is None:
            data_axes = P('data')
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, data_axes)
        return jax.jit(
            step,
            in_shardings=(repl, data_sh, data_sh, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_val_step(segmentor, mesh: Optional[Mesh] = None) -> Callable:
    """Loss-only forward (train=False BN) for workflow [('train',.),('val',.)]."""

    def step(state: TrainState, img, gt, rng):
        losses, _ = segmentor.compute_losses(
            state.variables, img, gt, rng, train=False)
        _, log_vars = total_loss_from_dict(losses)
        return log_vars

    if mesh is not None and mesh.devices.size > 1:
        # see make_train_step: skip the SPMD path on a 1-device mesh
        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P('data'))
        return jax.jit(step, in_shardings=(repl, data_sh, data_sh, repl),
                       out_shardings=repl)
    return jax.jit(step)


def default_data_mesh(devices=None) -> Mesh:
    """A 1-D 'data' mesh over all (or given) devices — the DDP-equivalent
    layout (SURVEY.md §2.9)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), ('data',))
