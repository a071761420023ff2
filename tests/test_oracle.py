"""Scripted-oracle solvability test (VERDICT r1 next-step #1a).

A hand-coded policy — aim the end-effector channel at the nearest cube, then
at the receptacle — must gather every cube through the REAL env.step path,
proving the env + reward + scoring plumbing admits a winning policy.
Mirrors a human playing the reference's click GUI (tools_simple_gui.py).
"""

import pytest
import jax
import numpy as np

from spatial_intention_maps_tpu.envs import env as E
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.oracle import run_oracle_episode

pytestmark = pytest.mark.slow  # end-to-end loop: minutes on the CPU mesh


def test_oracle_gathers_all_cubes_small_empty():
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=4,
        use_partial_observations=True,
        use_distance_to_receptacle_map=False,
        use_shortest_path_to_receptacle_map=True,
    )
    step = jax.jit(lambda s, a: E.step(params, s, a))
    state = jax.jit(lambda k: E.reset(params, k))(jax.random.PRNGKey(0))
    state, cubes, reward, n_actions = run_oracle_episode(
        params, step, state, max_actions=60
    )
    assert cubes == 4, (cubes, n_actions)
    assert bool(state.done)
    # 4 successes (1.0 each) + positive carry partial rewards.
    assert reward > 4.0, reward
    # Lifting a cube and dropping it in the receptacle is ~2 actions/cube
    # plus approach moves; an efficient policy finishes far under the cap.
    assert n_actions < 60
