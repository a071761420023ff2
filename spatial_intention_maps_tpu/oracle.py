"""Scripted oracle policy: proof the environment is solvable.

Drives the awaiting robot's end effector at the nearest available cube with
the end-effector channel, then at the receptacle once carrying (or scores
directly for rescue robots / plows through cubes for pushers).  This is the
hand-coded equivalent of a human playing the reference's click GUI
(tools_simple_gui.py: left-click move, right-click move+end-effector), used
to validate that the env + reward + scoring plumbing admits a winning policy
before any learning is attempted.

The oracle reads privileged world state (cube positions), not observations —
it validates the environment, not the perception stack.
"""

import math

import jax.numpy as jnp
import numpy as np

from . import constants
from .envs.types import CUBE_AVAILABLE

N = constants.LOCAL_MAP_PIXEL_WIDTH
PPM = constants.LOCAL_MAP_PIXELS_PER_METER
# Keep oracle clicks a couple of pixels inside the local map so the decoded
# end-effector target is exactly the intended world point (no clipping).
REACH = (N / 2 - 2) / PPM


def world_to_pixel(pos, heading, target_xy):
    """Invert the action decoding (store_new_action, envs.py:865-868):
    world target -> (pi, pj) local pixel for a robot at pos/heading."""
    delta = np.asarray(target_xy, np.float64) - np.asarray(pos, np.float64)
    dist = float(np.hypot(delta[0], delta[1]))
    phi = math.atan2(delta[1], delta[0]) - float(heading)
    dx = -dist * math.sin(phi)   # ego right
    dy = dist * math.cos(phi)    # ego forward
    pj = int(round(dx * PPM + N / 2 - 0.5))
    pi = int(round(N / 2 - dy * PPM - 0.5))
    return max(0, min(N - 1, pi)), max(0, min(N - 1, pj))


def flat_action(channel, pi, pj):
    return channel * N * N + pi * N + pj


def oracle_action(params, state):
    """(R,) int32 host-side actions: the awaiting robot gets the oracle
    action, everyone else -1."""
    awaiting = np.asarray(state.awaiting)
    actions = np.full(params.num_robots, -1, np.int32)
    if not awaiting.any():
        return actions
    r = int(np.argmax(awaiting))
    pos = np.asarray(state.robot_pos[r])
    heading = float(state.robot_heading[r])
    rtype = constants.ROBOT_TYPES[params.robot_types[r]]

    carrying = rtype == "lifting_robot" and bool(state.lifting[r])
    if carrying and params.has_receptacle:
        target = np.asarray(params.receptacle_position, np.float64)
        want_ee = True
    else:
        cube_xy = np.asarray(state.cube_pos[:, :2])
        avail = np.asarray(state.cube_status) == CUBE_AVAILABLE
        if not avail.any():
            # Nothing left: idle-ish action (move in place).
            pi, pj = world_to_pixel(pos, heading, pos + [0.05, 0.0])
            actions[r] = flat_action(0, pi, pj)
            return actions
        d = np.linalg.norm(cube_xy - pos[None], axis=-1)
        d[~avail] = np.inf
        c = int(np.argmin(d))
        if rtype == "pushing_robot" and params.has_receptacle:
            # Plow through the cube toward the receptacle: aim past the cube
            # along the cube->receptacle direction.
            recep = np.asarray(params.receptacle_position, np.float64)
            to_recep = recep - cube_xy[c]
            nrm = np.linalg.norm(to_recep)
            to_recep = to_recep / max(nrm, 1e-9)
            target = cube_xy[c] + to_recep * min(0.25, nrm)
            want_ee = False
        else:
            target = cube_xy[c]
            want_ee = True

    dist = float(np.linalg.norm(target - pos))
    if dist > REACH:
        # Out of local-map reach: waypoint toward it, no end-effector action.
        target = pos + (target - pos) * (REACH * 0.9 / dist)
        want_ee = False

    n_out = constants.ROBOT_NUM_OUTPUT_CHANNELS[rtype]
    channel = 1 if (want_ee and n_out > 1) else 0
    pi, pj = world_to_pixel(pos, heading, target)
    actions[r] = flat_action(channel, pi, pj)
    return actions


def run_oracle_episode(params, step_fn, state, max_actions=120):
    """Roll one episode with the oracle through a jitted ``step_fn(state,
    actions)`` (the real env.step).  Returns (state, total_cubes,
    total_reward, n_actions)."""
    total_reward = 0.0
    t = -1  # stays -1 if max_actions <= 0 so n_actions reports 0
    for t in range(max_actions):
        actions = oracle_action(params, state)
        out = step_fn(state, jnp.asarray(actions))
        state = out[0]
        reward = np.asarray(out[4])
        mask = np.asarray(out[6]["reward_mask"])
        total_reward += float(reward[mask].sum())
        if bool(out[5]):
            break
    return state, int(np.asarray(state.cum_cubes).sum()), total_reward, t + 1
