"""Checkpoint / resume (train.py:309-346 equivalents) via orbax.

Two artifacts per save like the reference: ``policy_<t>`` (network variables
per group, + intention nets) and ``checkpoint_<t>`` (timestep, episode,
optimizer states, replay buffers).  Old full checkpoints are pruned
(train.py:343-346).
"""

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _save_tree(path: Path, tree):
    ckptr = ocp.PyTreeCheckpointer()
    # force: the end-of-run save may target the same timestep the periodic
    # log_fn save already wrote.
    ckptr.save(path.resolve(), jax.tree.map(np.asarray, tree), force=True)


def _load_tree(path: Path, target=None):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(Path(path).resolve(), item=target)


def save_checkpoint(checkpoint_dir, timestep, trainer, prune=True,
                    include_buffers=True):
    """``include_buffers=False`` writes the full checkpoint without the
    replay buffers (policy/optimizer state only).  On a remote-attached TPU
    the buffers are by far the largest device->host transfer, so the trainer
    includes them only on a slower cadence (reference train.py:331 pickles
    buffers every save — local-disk economics, not remote-tunnel ones)."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)

    # Like the reference (train.py:309-327), the policy artifact carries the
    # policy nets only — target nets are re-synced from them at resume.
    policy_tree = {
        "timestep": timestep,
        "variables": [ts.variables for ts in trainer.train_states],
    }
    if trainer.policy.use_predicted_intention:
        policy_tree["intention_variables"] = [
            ts.intention_variables for ts in trainer.train_states
        ]
    _save_tree(checkpoint_dir / f"policy_{timestep:08d}", policy_tree)

    full_tree = {
        "timestep": timestep,
        "episode": trainer.episode,
        "opt_states": [ts.opt_state for ts in trainer.train_states],
    }
    if trainer.policy.use_predicted_intention:
        full_tree["intention_opt_states"] = [
            ts.intention_opt_state for ts in trainer.train_states
        ]
    if include_buffers:
        full_tree["buffers"] = trainer.buffers
    _save_tree(checkpoint_dir / f"checkpoint_{timestep:08d}", full_tree)

    if prune:
        kept = f"checkpoint_{timestep:08d}"
        for p in checkpoint_dir.glob("checkpoint_*"):
            if p.name != kept and p.is_dir():
                import shutil

                shutil.rmtree(p)


def load_policy(policy_path, trainer=None):
    # Restore straight to device: orbax returns numpy trees, and feeding
    # numpy leaves into the jitted round would re-upload them host->device
    # EVERY call (seconds per round through a remote-attached TPU tunnel).
    tree = jax.device_put(_load_tree(policy_path))
    # Older policy checkpoints stored target nets; new ones re-sync targets
    # from the policy nets (matching reference resume, train.py:208-214).
    targets = tree.get("target_variables", tree["variables"])
    if trainer is not None:
        for g, ts in enumerate(trainer.train_states):
            trainer.train_states[g] = ts.replace(
                variables=tree["variables"][g],
                target_variables=targets[g],
                intention_variables=(
                    tree.get("intention_variables", [None] * len(trainer.train_states))[g]
                ),
            )
    return tree


def load_checkpoint(checkpoint_path, trainer):
    # Orbax restores namedtuple-based states (optax TraceState etc.) as raw
    # dicts unless given a structure target — restore against the trainer's
    # live pytrees so optimizer/buffer states come back with their real
    # types, then device_put once (see load_policy).
    raw = _load_tree(checkpoint_path)
    target = {
        "timestep": raw["timestep"],
        "episode": raw["episode"],
        "opt_states": [ts.opt_state for ts in trainer.train_states],
    }
    if "intention_opt_states" in raw:
        target["intention_opt_states"] = [
            ts.intention_opt_state for ts in trainer.train_states
        ]
    if "buffers" in raw:
        target["buffers"] = list(trainer.buffers)
    tree = jax.device_put(_load_tree(checkpoint_path, target=target))
    trainer.timestep = int(tree["timestep"])
    trainer.episode = int(tree["episode"])
    for g, ts in enumerate(trainer.train_states):
        trainer.train_states[g] = ts.replace(opt_state=tree["opt_states"][g])
        if "intention_opt_states" in tree:
            trainer.train_states[g] = trainer.train_states[g].replace(
                intention_opt_state=tree["intention_opt_states"][g]
            )
    # Buffer-less checkpoints (fast cadence on remote-tunnel TPUs) resume
    # with empty buffers, like the reference's policy-only resume path.
    dp = getattr(trainer, "_dp", None) if getattr(trainer, "mesh", None) else None
    for g, buf in enumerate(tree.get("buffers", [])):
        trainer.buffers[g] = buf if dp is None else jax.device_put(buf, dp)
    return tree
