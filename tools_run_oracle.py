"""Run the scripted oracle on lifting_1-small_empty and report cubes/reward.

VERDICT round-1 #1a: the env + reward plumbing must be solvable by a
hand-coded policy through the REAL env.step path.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from spatial_intention_maps_tpu.envs import env as E
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.oracle import oracle_action, run_oracle_episode


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "small_empty"
    robot_type = sys.argv[2] if len(sys.argv) > 2 else "lifting_robot"
    n_episodes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    width = 0.5 if env_name.startswith("small") else 1.0
    params = EnvParams.from_robot_config(
        [{robot_type: 1}],
        env_name=env_name,
        room_length=1.0,
        room_width=width,
        num_cubes=10,
        use_partial_observations=True,
        use_distance_to_receptacle_map=False,
        use_shortest_path_to_receptacle_map=robot_type != "rescue_robot",
    )
    step = jax.jit(lambda s, a: E.step(params, s, a))
    reset = jax.jit(lambda k: E.reset(params, k))
    for ep in range(n_episodes):
        state = reset(jax.random.PRNGKey(ep))
        state, cubes, reward, n_act = run_oracle_episode(
            params, step, state, max_actions=120
        )
        print(
            f"ep {ep}: cubes={cubes}/10 reward={reward:.2f} actions={n_act} "
            f"steps={int(state.steps)} done={bool(state.done)} "
            f"collisions={int(np.asarray(state.cum_obstacle_collisions).sum())}o/"
            f"{int(np.asarray(state.cum_robot_collisions).sum())}r",
            flush=True,
        )


if __name__ == "__main__":
    main()
