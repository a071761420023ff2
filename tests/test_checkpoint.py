"""Checkpoint/resume round-trip tests (VERDICT r2 next-step #6).

Reference semantics: train.py:200-210 (resume from config-pointed
checkpoint), :309-346 (policy + full checkpoint incl. pickled replay
buffers, old-checkpoint pruning).  These tests exercise the orbax
equivalents end to end through the PRODUCTION FusedTrainer:

* save at timestep T -> restore into a FRESH trainer -> policy bytes,
  optimizer state, replay-buffer contents, and counters all match,
* continued training is bit-identical on both trainers when driven with
  the same update keys (mid-run resume equivalence),
* a buffers-excluded save (the remote-tunnel fast path) restores with
  empty rings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.train.fused import FusedTrainer
from spatial_intention_maps_tpu.utils.checkpoint import (
    load_checkpoint,
    load_policy,
    save_checkpoint,
)
from spatial_intention_maps_tpu.utils.config_dict import ConfigDict

pytestmark = pytest.mark.slow  # end-to-end loop: minutes on the CPU mesh


def tiny_cfg(params):
    return ConfigDict(
        batch_size=4,
        learning_rate=0.01,
        weight_decay=1e-4,
        grad_norm_clipping=100,
        num_input_channels=params.num_state_channels,
        use_predicted_intention=False,
        total_timesteps=16,
        exploration_frac=0.5,
        replay_buffer_size=32,
        use_double_dqn=True,
        discount_factors=[0.75],
        final_exploration=0.01,
        learning_starts_frac=0.05,
        train_freq=2,
        target_update_freq=8,
        num_parallel_envs=2,
        substeps_per_round=256,
        compute_dtype="float32",
        fcn_layer_planes=[8, 8, 8, 8],
        fcn_head_planes=[8, 8],
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A FusedTrainer trained for a short budget, checkpointed to disk."""
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=2,
        num_pass_pairs=1,
    )
    cfg = tiny_cfg(params)
    trainer = FusedTrainer(cfg, params, num_envs=2, seed=0)
    trainer.run()
    assert trainer.timestep >= cfg.total_timesteps
    assert int(trainer.buffers[0].size) > 0, "no transitions stored"

    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    save_checkpoint(ckpt_dir, trainer.timestep, trainer, include_buffers=True)
    return params, cfg, trainer, ckpt_dir


def _fresh(params, cfg):
    # A different seed: restored state must overwrite the fresh init fully.
    return FusedTrainer(cfg, params, num_envs=2, seed=1)


def _trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb, (ta, tb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_restores_policy_opt_and_buffers(trained):
    params, cfg, trainer, ckpt_dir = trained
    t = trainer.timestep
    other = _fresh(params, cfg)

    load_policy(ckpt_dir / f"policy_{t:08d}", other)
    load_checkpoint(ckpt_dir / f"checkpoint_{t:08d}", other)

    assert other.timestep == trainer.timestep
    assert other.episode == trainer.episode
    _trees_equal(other.train_states[0].variables, trainer.train_states[0].variables)
    # Policy checkpoints re-sync targets from the online net (reference
    # resume, train.py:208-214) — equal only right after a target sync, so
    # compare against the online net, not the source trainer's target.
    _trees_equal(other.train_states[0].target_variables,
                 trainer.train_states[0].variables)
    _trees_equal(other.train_states[0].opt_state, trainer.train_states[0].opt_state)
    _trees_equal(other.buffers[0], trainer.buffers[0])


def test_resume_continues_identically(trained):
    """Mid-run resume equivalence: with identical update keys, the restored
    trainer's next updates are bit-identical to the original's."""
    params, cfg, trainer, ckpt_dir = trained
    t = trainer.timestep
    other = _fresh(params, cfg)
    load_policy(ckpt_dir / f"policy_{t:08d}", other)
    load_checkpoint(ckpt_dir / f"checkpoint_{t:08d}", other)

    # Align the source trainer's target net with the restored one's
    # (policy-artifact resume re-syncs targets; see test above).
    from spatial_intention_maps_tpu.train import dqn as dqn_mod

    trainer.train_states[0] = dqn_mod.sync_target(trainer.train_states[0])

    for i in range(3):
        k = jax.random.PRNGKey(100 + i)
        info_a = trainer._update(0, k)
        info_b = other._update(0, k)
        np.testing.assert_array_equal(
            np.asarray(info_a["loss"]), np.asarray(info_b["loss"])
        )
    _trees_equal(other.train_states[0].variables, trainer.train_states[0].variables)
    _trees_equal(other.train_states[0].opt_state, trainer.train_states[0].opt_state)


def test_bufferless_checkpoint_resumes_empty(trained, tmp_path):
    params, cfg, trainer, _ = trained
    t = trainer.timestep
    save_checkpoint(tmp_path, t, trainer, include_buffers=False)

    other = _fresh(params, cfg)
    load_policy(tmp_path / f"policy_{t:08d}", other)
    load_checkpoint(tmp_path / f"checkpoint_{t:08d}", other)
    assert other.timestep == trainer.timestep
    assert int(other.buffers[0].size) == 0  # policy-only resume semantics
    _trees_equal(other.train_states[0].opt_state, trainer.train_states[0].opt_state)


def test_checkpoint_pruning(trained, tmp_path):
    """Old full checkpoints are pruned, policy artifacts are kept
    (train.py:343-346)."""
    params, cfg, trainer, _ = trained
    save_checkpoint(tmp_path, 1, trainer, include_buffers=False)
    save_checkpoint(tmp_path, 2, trainer, include_buffers=False)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert "checkpoint_00000002" in names
    assert "checkpoint_00000001" not in names
    assert "policy_00000001" in names and "policy_00000002" in names
