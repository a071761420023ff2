"""Environment parameter / state containers.

``EnvParams`` is a hashable, frozen static configuration (shapes and flags
derive from it, so it is closed over by jitted functions).  ``EnvState`` is a
pure pytree holding everything mutable for ONE environment; batching is a
leading vmap axis added by the vectorized wrappers.

This is the re-expression of the reference's object graph (VectorEnv + Robot
+ RobotController + Mapper + OccupancyMap instance state, envs.py) as a
fixed-shape state machine (SURVEY.md §7 design stance).
"""

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import constants
from . import geometry

# FSM codes (RobotController states, envs.py:1374, 1394-1472)
IDLE, MOVING, MANIPULATING = 0, 1, 2

# Cube status codes
CUBE_AVAILABLE, CUBE_LIFTED, CUBE_THROWN, CUBE_REMOVED = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class EnvParams:
    """Static environment configuration (VectorEnv.__init__ kwargs,
    envs.py:37-53, resolved to fixed shapes)."""

    env_name: str = "small_empty"
    room_length: float = 1.0
    room_width: float = 0.5
    num_cubes: int = 10
    # Robots: per-robot type code and group index (flattened robot_config).
    robot_types: Tuple[int, ...] = (constants.LIFTING,)
    robot_groups: Tuple[int, ...] = (0,)
    # State representation flags
    use_robot_map: bool = True
    use_distance_to_receptacle_map: bool = False
    distance_to_receptacle_map_scale: float = 0.25
    use_shortest_path_to_receptacle_map: bool = True
    use_shortest_path_map: bool = True
    shortest_path_map_scale: float = 0.25
    use_intention_map: bool = False
    intention_map_encoding: str = "ramp"
    intention_map_scale: float = 1.0
    intention_map_line_thickness: int = 2
    use_history_map: bool = False
    use_intention_channels: bool = False
    intention_channel_encoding: str = "spatial"
    intention_channel_nonspatial_scale: float = 0.025
    # Rewards
    use_shortest_path_partial_rewards: bool = True
    success_reward: float = 1.0
    partial_rewards_scale: float = 2.0
    lifting_pointless_drop_penalty: float = 0.25
    obstacle_collision_penalty: float = 0.25
    robot_collision_penalty: float = 1.0
    # Misc
    use_shortest_path_movement: bool = True
    use_partial_observations: bool = True
    inactivity_cutoff_per_robot: int = 100
    # TPU-side tunables
    num_pass_pairs: int = 3         # wavefront sweep iterations
    substep_chunk: int = 200        # substeps between map refreshes
    max_substeps: int = constants.STEP_LIMIT_SIM_STEPS + 400

    def __post_init__(self):
        # Reference invariant checks (envs.py:436-441, 2047-2051, 517-521).
        assert self.room_length >= self.room_width
        assert self.num_cubes > 0
        assert self.num_robots >= 1
        assert self.num_groups <= 4, "more than 4 robot groups not supported"
        if self.env_name.startswith("small"):
            assert abs(self.room_length - 1.0) < 1e-9 and abs(self.room_width - 0.5) < 1e-9
        elif self.env_name.startswith("large"):
            assert abs(self.room_length - 1.0) < 1e-9 and abs(self.room_width - 1.0) < 1e-9
        has_rescue = constants.RESCUE in self.robot_types
        if has_rescue:
            assert all(t == constants.RESCUE for t in self.robot_types), (
                "rescue robots cannot mix with other types"
            )
            assert not self.use_distance_to_receptacle_map
            assert not self.use_shortest_path_to_receptacle_map
        # Each group must be homogeneous (envs.py:438).
        seen = {}
        for t, g in zip(self.robot_types, self.robot_groups):
            assert seen.setdefault(g, t) == t, "robot groups must be homogeneous"

    # ------------------------------------------------------------------
    @classmethod
    def from_robot_config(cls, robot_config, **kwargs):
        """Build from the reference-style robot_config list of
        single-key dicts, e.g. [{'lifting_robot': 2}, {'throwing_robot': 2}]
        (envs.py:137-144)."""
        types, groups = [], []
        for gi, g in enumerate(robot_config):
            (robot_type, count), = g.items()
            for _ in range(count):
                types.append(constants.ROBOT_TYPES.index(robot_type))
                groups.append(gi)
        return cls(robot_types=tuple(types), robot_groups=tuple(groups), **kwargs)

    @property
    def num_robots(self) -> int:
        return len(self.robot_types)

    @property
    def num_groups(self) -> int:
        return max(self.robot_groups) + 1

    @property
    def group_types(self) -> Tuple[int, ...]:
        out = {}
        for t, g in zip(self.robot_types, self.robot_groups):
            out[g] = t
        return tuple(out[g] for g in range(self.num_groups))

    @property
    def has_receptacle(self) -> bool:
        # No receptacle in rescue envs (envs.py:150-151, 440-441)
        return constants.RESCUE not in self.robot_types

    @property
    def receptacle_position(self):
        if not self.has_receptacle:
            return None
        rw = constants.RECEPTACLE_WIDTH
        return (self.room_length / 2 - rw / 2, self.room_width / 2 - rw / 2)

    @property
    def map_shape(self):
        return constants.global_map_shape(self.room_length, self.room_width)

    @property
    def layout_shapes(self):
        return geometry.layout_shapes(self.env_name, self.has_receptacle)

    @property
    def inactivity_cutoff(self) -> int:
        return self.num_robots * self.inactivity_cutoff_per_robot

    # Per-robot derived constants as numpy arrays (become jnp constants).
    @property
    def base_lengths(self):
        names = [constants.ROBOT_TYPES[t] for t in self.robot_types]
        return np.array([constants.ROBOT_BASE_LENGTHS[n] for n in names], np.float32)

    @property
    def ee_locations(self):
        return np.array(
            [constants.end_effector_location(b) for b in self.base_lengths], np.float32
        )

    @property
    def radii(self):
        return np.array(
            [constants.robot_radius(b) for b in self.base_lengths], np.float32
        )

    @property
    def cspace_radii_px(self):
        """Per-robot configuration-space dilation radius in pixels
        (floor(RADIUS * ppm), envs.py:2420)."""
        return tuple(
            int(math.floor(r * constants.LOCAL_MAP_PIXELS_PER_METER)) for r in self.radii
        )

    @property
    def has_hooks(self):
        names = [constants.ROBOT_TYPES[t] for t in self.robot_types]
        return np.array([constants.ROBOT_HAS_HOOKS[n] for n in names])

    @property
    def num_output_channels(self):
        """Per-GROUP number of action channels (envs.py:810, 1090)."""
        return tuple(
            constants.ROBOT_NUM_OUTPUT_CHANNELS[constants.ROBOT_TYPES[t]]
            for t in self.group_types
        )

    @property
    def max_output_channels(self) -> int:
        return max(self.num_output_channels)

    @property
    def num_state_channels(self) -> int:
        """Channel count of the observation stack (get_state order,
        envs.py:2067-2112)."""
        c = 1  # overhead map
        c += int(self.use_robot_map)
        c += int(self.use_distance_to_receptacle_map)
        c += int(self.use_shortest_path_to_receptacle_map)
        c += int(self.use_shortest_path_map)
        c += int(self.use_history_map)
        c += int(self.use_intention_map)
        if self.use_intention_channels:
            per = 2 if self.intention_channel_encoding == "nonspatial" else 1
            c += per * (self.num_robots - 1)
        return c


@struct.dataclass
class EnvState:
    """All mutable state of one environment (pytree)."""

    key: jnp.ndarray                 # PRNG key

    # Layout (resampled per episode for *_rand layouts)
    rects: jnp.ndarray               # (N_RECT, 4)
    corners: jnp.ndarray             # (N_CORNER, 3)
    robot_bounds: jnp.ndarray        # (4,)
    cube_bounds: jnp.ndarray         # (4,)
    wall_map: jnp.ndarray            # (H, W) bool
    seg_base: jnp.ndarray            # (H, W) uint8

    # Robot poses + servo targets
    robot_pos: jnp.ndarray           # (R, 2)
    robot_heading: jnp.ndarray       # (R,)
    target_pos: jnp.ndarray          # (R, 2)
    target_heading: jnp.ndarray      # (R,)

    # Controller FSM
    fsm: jnp.ndarray                 # (R,) int32
    awaiting: jnp.ndarray            # (R,) bool
    action: jnp.ndarray              # (R, 3) int32 (channel, i, j)
    target_ee: jnp.ndarray           # (R, 2)
    waypoints: jnp.ndarray           # (R, K, 2) world coords
    wp_headings: jnp.ndarray         # (R, K)
    num_wp: jnp.ndarray              # (R,) int32
    wp_index: jnp.ndarray            # (R,) int32
    prev_pos: jnp.ndarray            # (R, 2)
    prev_heading: jnp.ndarray        # (R,)
    has_prev: jnp.ndarray            # (R,) bool
    ctrl_sim_steps: jnp.ndarray      # (R,) int32
    consec_turn: jnp.ndarray         # (R,) int32
    manip_target: jnp.ndarray        # (R,) int32
    manip_steps: jnp.ndarray         # (R,) int32
    lifting: jnp.ndarray             # (R,) bool (lift_state == 'lifting')
    carried_cube: jnp.ndarray        # (R,) int32, -1 if none
    # throw-noise RNG state (dynamics.throw_draws): per-episode seed +
    # per-robot draw counter, hash-based so the Pallas kernel can draw too
    throw_seed: jnp.ndarray          # int32 scalar
    throw_counter: jnp.ndarray       # (R,) int32
    potential_cube: jnp.ndarray      # (R,) int32, -1 if none
    blocked_obstacle: jnp.ndarray    # (R,) bool (current contact proxy)
    blocked_robot: jnp.ndarray       # (R,) bool

    # Per-action stats (reset by store_new_action, envs.py:911-919)
    cubes: jnp.ndarray               # (R,) int32
    cubes_with_reward: jnp.ndarray   # (R,) int32
    step_distance: jnp.ndarray       # (R,) f32
    prev_wp_pos: jnp.ndarray         # (R, 2)
    collided_obstacle: jnp.ndarray   # (R,) bool
    collided_robot: jnp.ndarray      # (R,) bool
    pointless_drop: jnp.ndarray      # (R,) bool
    reward: jnp.ndarray              # (R,) f32
    cube_dist_closer: jnp.ndarray    # (R,) f32
    # deferred lifted/thrown-cube partial-reward pair (SURVEY hard-part #5)
    pr_initial: jnp.ndarray          # (R, 2)
    pr_final: jnp.ndarray            # (R, 2)
    pr_pending: jnp.ndarray          # (R,) bool
    push_initial_cube_pos: jnp.ndarray  # (C, 2) snapshot at step start

    # Cumulative episode stats (envs.py:849-854)
    cum_cubes: jnp.ndarray           # (R,) int32
    cum_distance: jnp.ndarray        # (R,) f32
    cum_reward: jnp.ndarray          # (R,) f32
    cum_obstacle_collisions: jnp.ndarray  # (R,) int32
    cum_robot_collisions: jnp.ndarray     # (R,) int32

    # Cubes
    cube_pos: jnp.ndarray            # (C, 3)
    cube_heading: jnp.ndarray        # (C,)
    cube_vel: jnp.ndarray            # (C, 3)
    cube_status: jnp.ndarray         # (C,) int32

    # Per-robot maps
    overhead_map: jnp.ndarray        # (R, H, W) uint8 seg codes
    occupancy: jnp.ndarray           # (R, H, W) bool

    # Episode counters
    steps: jnp.ndarray               # int32
    simulation_steps: jnp.ndarray    # int32
    inactivity_steps: jnp.ndarray    # int32
    done: jnp.ndarray                # bool
