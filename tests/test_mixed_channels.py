"""Mixed action-channel heterogeneous team: lifting (2-ch) + pushing (1-ch)
nets in ONE program (VERDICT r3 missing #5; reference policies.py:35-42
per-group nets, envs.py:1058-1090 channel counts, and the
lifting_2_pushing_2-*.yml experiment family).

test_heterogeneous.py covers lifting+throwing — both 2-channel; what is
new here is the per-group action-space SIZE difference flowing through
epsilon-greedy sampling, the -inf channel padding in the batched argmax,
replay routing, and the Double-DQN update's action gather.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.policies import action_space_size
from spatial_intention_maps_tpu.train.fused import FusedTrainer
from spatial_intention_maps_tpu.utils.config_dict import ConfigDict

pytestmark = pytest.mark.slow  # end-to-end loop: minutes on the CPU mesh


@pytest.fixture(scope="module")
def mixed_trained():
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}, {"pushing_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=3,
        num_pass_pairs=1,
    )
    assert tuple(params.num_output_channels) == (2, 1)
    cfg = ConfigDict(
        batch_size=4,
        learning_rate=0.01,
        weight_decay=1e-4,
        grad_norm_clipping=100,
        num_input_channels=params.num_state_channels,
        use_predicted_intention=False,
        total_timesteps=24,
        exploration_frac=0.5,
        replay_buffer_size=64,
        use_double_dqn=True,
        discount_factors=[0.85, 0.85],
        final_exploration=0.01,
        learning_starts_frac=0.05,
        train_freq=2,
        target_update_freq=16,
        num_parallel_envs=2,
        substeps_per_round=256,
        compute_dtype="float32",
        fcn_layer_planes=[8, 8, 8, 8],
        fcn_head_planes=[8, 8],
    )
    trainer = FusedTrainer(cfg, params, num_envs=2, seed=0)
    assert trainer.policy.num_groups == 2
    logged = {}
    trainer.run(log_fn=lambda t, m, info, d: logged.update(m))
    return params, trainer, logged


def test_both_groups_store_and_update(mixed_trained):
    _, trainer, logged = mixed_trained
    sizes = trainer.buffer_sizes
    assert sizes[0] > 0, f"lifting ring empty: {sizes}"
    assert sizes[1] > 0, f"pushing ring empty: {sizes}"
    for g in range(2):
        loss = logged.get(f"loss/group_{g}")
        assert loss is not None and np.isfinite(loss), (g, logged)


def test_actions_respect_per_group_spaces(mixed_trained):
    """The pushing ring must only ever contain channel-0 actions: its flat
    action space is 1*96*96 while the lifting group's is 2*96*96 — both the
    epsilon-random draw (spaces[group] scaling) and the padded greedy argmax
    (-inf fill, policies.py act) are under test."""
    params, trainer, _ = mixed_trained
    for g in range(2):
        buf = trainer.buffers[g]
        n = int(buf.size)
        acts = np.asarray(buf.actions[:n])
        space = action_space_size(params.num_output_channels[g])
        assert np.all((acts >= 0) & (acts < space)), (g, acts.min(), acts.max())


def test_greedy_argmax_never_picks_padded_channel(mixed_trained):
    """Greedy (eps=0) actions for the 1-channel group stay inside its space
    even though the batched Q stack is padded to C_max=2 channels."""
    params, trainer, _ = mixed_trained
    policy = trainer.policy
    variables = trainer._variables()
    n = 96
    key = jax.random.PRNGKey(3)
    obs = jax.random.uniform(key, (4, n, n, params.num_state_channels))
    group_ids = jnp.asarray([0, 1, 0, 1], jnp.int32)
    actions, q_sel = policy.act(variables, obs, group_ids, 0.0, key)
    actions = np.asarray(actions)
    spaces = np.asarray(
        [action_space_size(c) for c in params.num_output_channels]
    )[np.asarray(group_ids)]
    assert np.all(actions < spaces), (actions, spaces)
    # The padded channel is -inf in the selected Q stack for 1-ch samples.
    q = np.asarray(q_sel, np.float32)
    assert np.all(np.isneginf(q[1, :, :, 1])) and np.all(np.isneginf(q[3, :, :, 1]))
