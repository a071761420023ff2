"""Double-DQN update (train.py:108-158 equivalents) in optax.

Optimizer matches the reference exactly: grad-norm clip 100 on raw grads,
weight decay 1e-4 folded into the gradient (torch SGD semantics), momentum
0.9, lr 0.01 (train.py:133-134, 186).  Smooth-L1 (Huber delta=1) TD loss.
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import constants

N = constants.LOCAL_MAP_PIXEL_WIDTH


def make_optimizer(learning_rate, weight_decay, grad_norm_clipping):
    tx = []
    if grad_norm_clipping is not None:
        tx.append(optax.clip_by_global_norm(float(grad_norm_clipping)))
    if weight_decay:
        tx.append(optax.add_decayed_weights(float(weight_decay)))
    tx.append(optax.trace(decay=0.9, nesterov=False))
    tx.append(optax.scale(-float(learning_rate)))
    return optax.chain(*tx)


@struct.dataclass
class GroupTrainState:
    """Per-robot-group training state: online net, target net, optimizer."""

    variables: Any       # {'params', 'batch_stats'}
    target_variables: Any
    opt_state: Any
    intention_variables: Any = None
    intention_opt_state: Any = None


def create_train_state(model, variables, optimizer, intention_model=None,
                       intention_variables=None, intention_optimizer=None):
    ts = GroupTrainState(
        variables=variables,
        target_variables=jax.tree.map(lambda x: x, variables),
        opt_state=optimizer.init(variables["params"]),
        intention_variables=intention_variables,
        intention_opt_state=(
            intention_optimizer.init(intention_variables["params"])
            if intention_variables is not None else None
        ),
    )
    return ts


def smooth_l1(x):
    """torch smooth_l1_loss elementwise (beta=1)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def _flat_q(qmap):
    """(B, 96, 96, C) -> (B, C*96*96) channel-major (torch CHW view)."""
    b = qmap.shape[0]
    return jnp.transpose(qmap, (0, 3, 1, 2)).reshape(b, -1)


def dqn_update(model, optimizer, ts: GroupTrainState, batch, discount_factor,
               use_double_dqn=True, axis_name=None):
    """One DQN step on a sampled batch (train.py:108-141).

    batch: dict(state (B,96,96,C), action (B,), reward (B,),
    next_state (B,96,96,C), has_next (B,)).
    Returns (new_ts, info dict).

    ``axis_name``: when called inside shard_map/pmap with the batch sharded
    over that mesh axis, gradients (and the BN statistics / metrics) are
    mean-reduced across devices so replicated parameters stay replicated —
    the TPU-native equivalent of the reference's DataParallel scatter/gather
    (policies.py:39).  Per-shard BN batch statistics are averaged (sync-BN up
    to the variance-of-means term; documented divergence).
    """
    s, a, r = batch["state"], batch["action"], batch["reward"]
    s_next, has_next = batch["next_state"], batch["has_next"]

    # Next-state values from frozen nets (no grad).  The reference evaluates
    # target/policy nets in train() but under no_grad; BN uses batch stats in
    # torch train mode — we use running averages (eval mode) for stability
    # and determinism (documented divergence).
    if use_double_dqn:
        q_next_online = _flat_q(model.apply(ts.variables, s_next, train=False))
        best = jnp.argmax(q_next_online, axis=-1)
        q_next_target = _flat_q(model.apply(ts.target_variables, s_next, train=False))
        next_val = jnp.take_along_axis(q_next_target, best[:, None], axis=1)[:, 0]
    else:
        q_next_target = _flat_q(model.apply(ts.target_variables, s_next, train=False))
        next_val = jnp.max(q_next_target, axis=-1)
    next_val = jnp.where(has_next, next_val, 0.0)
    expected = r + discount_factor * next_val

    def loss_fn(params):
        variables = {**ts.variables, "params": params}
        out, mutated = model.apply(
            variables, s, train=True, mutable=["batch_stats"]
        )
        q = jnp.take_along_axis(_flat_q(out), a[:, None], axis=1)[:, 0]
        td = q - jax.lax.stop_gradient(expected)
        loss = jnp.mean(smooth_l1(td))
        return loss, (jnp.mean(jnp.abs(td)), mutated)

    (loss, (td_error, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        ts.variables["params"]
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        td_error = jax.lax.pmean(td_error, axis_name)
        mutated = jax.lax.pmean(mutated, axis_name)
    updates, new_opt_state = optimizer.update(
        grads, ts.opt_state, ts.variables["params"]
    )
    new_params = optax.apply_updates(ts.variables["params"], updates)
    new_variables = {
        "params": new_params,
        "batch_stats": mutated["batch_stats"],
    }
    ts = ts.replace(variables=new_variables, opt_state=new_opt_state)
    return ts, {"loss": loss, "td_error": td_error}


def intention_update(model, optimizer, ts: GroupTrainState, batch, axis_name=None):
    """BCE-with-logits on the ground-truth intention channel
    (train.py:143-158)."""
    s = batch["state"]
    x = s[..., :-1]
    target = s[..., -1:]

    def loss_fn(params):
        variables = {**ts.intention_variables, "params": params}
        logits, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        loss = jnp.mean(
            optax.sigmoid_binary_cross_entropy(logits, target)
        )
        return loss, mutated

    (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        ts.intention_variables["params"]
    )
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        mutated = jax.lax.pmean(mutated, axis_name)
    updates, new_opt = optimizer.update(
        grads, ts.intention_opt_state, ts.intention_variables["params"]
    )
    new_params = optax.apply_updates(ts.intention_variables["params"], updates)
    ts = ts.replace(
        intention_variables={"params": new_params, "batch_stats": mutated["batch_stats"]},
        intention_opt_state=new_opt,
    )
    return ts, {"loss_intention": loss}


def sync_target(ts: GroupTrainState) -> GroupTrainState:
    """target <- online (train.py:266-269)."""
    return ts.replace(target_variables=jax.tree.map(lambda x: x, ts.variables))
