"""Round-2 diagnostic #2: why do 74% of random actions end in obstacle
collisions?  Classify collision outcomes by action-target validity.

For each random action on lifting_1-small_empty:
  * was the decoded end-effector target inside the (half-width-shrunk) room?
  * did the action end with collided_obstacle / collided_robot?
  * how far from the target did the robot stop?

If valid in-room targets frequently collide, the controller/planner has a
bug; if only wall/outside targets collide, the -0.25 field is reference
parity (the reference drives at raw wall targets too, envs.py:2496-2503).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu import config as config_mod, constants
from spatial_intention_maps_tpu.envs import env as env_core
from spatial_intention_maps_tpu.factory import env_params_from_cfg
from spatial_intention_maps_tpu.policies import action_space_size


def main():
    cfg = config_mod.load_config("configs/experiments/base/lifting_1-small_empty-base.yml")
    params = env_params_from_cfg(cfg)
    B, K = 64, 24
    space = action_space_size(2)
    hw = constants.ROBOT_HALF_WIDTH

    def probe_step(carry, _):
        state, key = carry
        key, k1 = jax.random.split(key)
        a = jax.random.randint(k1, (), 0, space)
        actions = jnp.full((params.num_robots,), -1, jnp.int32).at[0].set(a)
        _, acting, ch, pi, pj, tee = env_core.compute_action_target(
            params, state, actions
        )
        in_room = (
            (jnp.abs(tee[0]) < params.room_length / 2 - hw)
            & (jnp.abs(tee[1]) < params.room_width / 2 - hw)
        )
        state = env_core.inject_action(params, state, actions)
        target_wp = state.waypoints[0, state.num_wp[0] - 1]
        state = env_core.run_until_idle(params, state)
        rec = dict(
            in_room=in_room,
            ch=ch,
            coll_obs=state.collided_obstacle[0],
            coll_rob=state.collided_robot[0],
            dist_to_wp=jnp.linalg.norm(state.robot_pos[0] - target_wp),
            dist_to_tee=jnp.linalg.norm(state.robot_pos[0] - tee),
            sim_steps=state.ctrl_sim_steps[0],
        )
        # Re-arm: pretend the step ended; reset per-action flags like inject
        # will on the next iteration (inject does it for the acting robot).
        state = env_core.set_awaiting(state)
        return (state, key), rec

    def run_one(key):
        k1, k2 = jax.random.split(key)
        state = env_core.reset(params, k1)
        (_, _), recs = jax.lax.scan(probe_step, (state, k2), None, length=K)
        return recs

    recs = jax.jit(jax.vmap(run_one))(jax.random.split(jax.random.PRNGKey(0), B))
    recs = {k: np.asarray(v).reshape(-1) for k, v in recs.items()}

    in_room = recs["in_room"]
    co = recs["coll_obs"]
    cr = recs["coll_rob"]
    print(f"total actions: {len(in_room)}")
    print(f"target in room: {in_room.mean():.3f}")
    for label, m in [("in-room targets", in_room), ("wall/outside targets", ~in_room)]:
        if m.sum() == 0:
            continue
        print(f"--- {label} (n={m.sum()}):")
        print(f"  collided_obstacle: {co[m].mean():.3f}")
        print(f"  collided_robot:    {cr[m].mean():.3f}")
        print(f"  dist_to_wp:   mean={recs['dist_to_wp'][m].mean():.4f} "
              f"p90={np.percentile(recs['dist_to_wp'][m], 90):.4f}")
        print(f"  dist_to_tee:  mean={recs['dist_to_tee'][m].mean():.4f}")
        print(f"  sim_steps:    mean={recs['sim_steps'][m].mean():.1f}")
    ok = in_room & ~co & ~cr
    print(f"clean in-room completion rate: {ok.sum() / max(in_room.sum(),1):.3f}")
    # Where do in-room collisions happen? near start or near target?
    m = in_room & co
    if m.sum():
        print(f"in-room collisions: n={m.sum()}, dist_to_wp mean="
              f"{recs['dist_to_wp'][m].mean():.4f}, "
              f"p10={np.percentile(recs['dist_to_wp'][m],10):.4f}, "
              f"p50={np.percentile(recs['dist_to_wp'][m],50):.4f}, "
              f"p90={np.percentile(recs['dist_to_wp'][m],90):.4f}")
        print(f"  sim_steps p50={np.percentile(recs['sim_steps'][m],50):.0f}")
    os._exit(0)


if __name__ == "__main__":
    main()
