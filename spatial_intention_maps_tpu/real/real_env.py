"""Host-side real-robot environment (the reference's ``real=True`` path,
envs.py:187-222 + RealRobotController envs.py:1504-1873, re-architected).

The reference mirrors physical poses into PyBullet and re-uses the sim
mapper; here we mirror poses into an :class:`EnvState` and re-use the jitted
perception/observation machinery, while planning runs on the native C++ SPFA
library and steering on the pure-pursuit controller — everything off the TPU
hot path.

Hardware dependencies (cameras for the pose servers, the Anki Vector SDK)
are import-gated; without them this module still imports and the FSM logic
is unit-testable through :class:`RobotDriver` with a fake transport.
"""

import math
import time
from multiprocessing.connection import Client

import numpy as np

from .. import constants
from ..envs import env as env_core
from ..envs import geometry
from ..native import GridGraph
from . import POSE_SERVER_AUTHKEY, POSE_SERVER_PORTS
from .pure_pursuit import LOOKAHEAD_DISTANCE, TURN_THRESHOLD, arc_command, heading_error, lookahead_point

# Controller FSM states (envs.py:1564)
IDLE, TURNING, DRIVING, ALIGNING, LIFTING, STOPPING = (
    "idle", "turning", "driving", "aligning", "lifting", "stopping",
)


class RobotDriver:
    """Pure-pursuit waypoint follower for one physical robot.

    transport: object with ``set_wheel_speeds(left, right)``,
    ``set_lift(up: bool)`` — the Vector SDK in production, a fake in tests.
    Implements the reference's stuck-turn / stuck-drive / failed-lift
    recovery behaviors (envs.py:1607-1705) in simplified form.
    """

    STUCK_SECONDS = 3.0

    def __init__(self, transport, robot_type="lifting_robot"):
        self.transport = transport
        self.robot_type = robot_type
        self.state = IDLE
        self.waypoints = None
        self.end_effector_action = False
        self._last_progress = (None, time.time())

    def new_action(self, waypoints, end_effector_action):
        self.waypoints = [tuple(w[:2]) for w in waypoints]
        self.end_effector_action = end_effector_action
        self.state = TURNING
        self._last_progress = (None, time.time())

    def is_idle(self):
        return self.state == IDLE

    def step(self, position, heading):
        """One control tick given the latest pose estimate; issues motor
        commands through the transport."""
        if self.state == IDLE or self.waypoints is None:
            return
        target = lookahead_point(position, self.waypoints)
        dist_to_goal = math.hypot(
            self.waypoints[-1][0] - position[0], self.waypoints[-1][1] - position[1]
        )

        # Stuck detection (envs.py:1607-1640): no progress -> re-issue.
        prev, t0 = self._last_progress
        if prev is not None and math.hypot(
            position[0] - prev[0], position[1] - prev[1]
        ) > 0.01:
            self._last_progress = (position, time.time())
        elif prev is None:
            self._last_progress = (position, time.time())
        elif time.time() - t0 > self.STUCK_SECONDS:
            self.transport.set_wheel_speeds(-0.04, -0.04)  # back off
            self._last_progress = (position, time.time())
            return

        if self.state == TURNING:
            err = heading_error(position, heading, target)
            if abs(err) < TURN_THRESHOLD:
                self.state = DRIVING
            else:
                w = 0.08 if err > 0 else -0.08
                self.transport.set_wheel_speeds(-w, w)
                return

        if self.state == DRIVING:
            if dist_to_goal < 0.01:
                self.transport.set_wheel_speeds(0.0, 0.0)
                if self.end_effector_action and self.robot_type != "pushing_robot":
                    self.state = LIFTING
                    self.transport.set_lift(up=True)
                    self._lift_t0 = time.time()
                else:
                    self.state = IDLE
                return
            err = heading_error(position, heading, target)
            if abs(err) > math.radians(45):
                self.state = TURNING
                return
            left, right = arc_command(position, heading, target)
            self.transport.set_wheel_speeds(left, right)
            return

        if self.state == LIFTING:
            if time.time() - self._lift_t0 > 1.5:
                self.state = IDLE
            return


class RealEnv:
    """SimEnv-compatible environment over physical robots.

    Sequential protocol identical to the sim: exactly one robot awaits an
    action; ``step(action)`` plans a shortest path on the occupancy grid
    (native SPFA), drives the robot with pure pursuit while polling the
    ArUco pose servers, then returns the next awaiting robot's observation
    built by the jitted sim mapper on the mirrored state.
    """

    def __init__(self, params, real_robot_indices, real_cube_indices,
                 transports=None, poll_hz=10.0):
        import jax

        self.params = params
        self.poll_dt = 1.0 / poll_hz
        size = "large" if params.env_name.startswith("large") else "small"
        self.conns = [
            Client(("localhost", port), authkey=POSE_SERVER_AUTHKEY)
            for port in POSE_SERVER_PORTS[size]
        ]
        self.robot_ids = list(real_robot_indices)
        self.cube_ids = list(real_cube_indices)
        if transports is None:
            from . import vector_sdk

            transports = [
                _VectorTransport(vector_sdk.connect(i)) for i in real_robot_indices
            ]
        self.drivers = [
            RobotDriver(t, constants.ROBOT_TYPES[ty])
            for t, ty in zip(transports, params.robot_types)
        ]
        # Mirrored device state for observation building.
        self._reset_fn = jax.jit(lambda k: env_core.reset(params, k))
        self._observe_fn = jax.jit(lambda s: env_core.observe_standalone(params, s))
        self.state = None

    # -- pose mirroring (update_poses, envs.py:389-432) -------------------
    def poll_poses(self):
        robot_poses, cube_poses = {}, {}
        for conn in self.conns:
            conn.send(None)
            rp, cp = conn.recv()
            if rp:
                robot_poses.update(rp)
            if cp:
                cube_poses.update(cp)
        return robot_poses, cube_poses

    def _mirror(self, robot_poses, cube_poses):
        import jax.numpy as jnp

        s = self.state
        rpos = np.asarray(s.robot_pos)
        rhead = np.asarray(s.robot_heading)
        for k, rid in enumerate(self.robot_ids):
            pose = robot_poses.get(rid)
            if pose:
                rpos[k] = pose["position"]
                rhead[k] = pose["heading"]
        cpos = np.asarray(s.cube_pos)
        chead = np.asarray(s.cube_heading)
        for k, cid in enumerate(self.cube_ids):
            pose = cube_poses.get(cid)
            if pose:
                cpos[k, :2] = pose["position"]
                chead[k] = pose["heading"]
        self.state = s.replace(
            robot_pos=jnp.asarray(rpos), robot_heading=jnp.asarray(rhead),
            cube_pos=jnp.asarray(cpos), cube_heading=jnp.asarray(chead),
        )

    # -- planning on the native SPFA grid ---------------------------------
    def _plan(self, robot_index, target_xy):
        h, w = self.params.map_shape
        occ = np.asarray(self.state.occupancy[robot_index])
        import jax.numpy as jnp

        from ..ops import raster_ops

        rmask = np.asarray(
            geometry.room_mask(h, w, self.params.room_length, self.params.room_width)
        )
        rad = self.params.cspace_radii_px[robot_index]
        cspace = rmask & ~np.asarray(
            raster_ops.binary_dilate_disk(jnp.asarray(occ), rad)
        )
        graph = GridGraph(cspace.astype(np.uint8))
        pos = np.asarray(self.state.robot_pos[robot_index])
        si, sj = geometry.position_to_pixel(
            jnp.float32(pos[0]), jnp.float32(pos[1]), h, w
        )
        ti, tj = geometry.position_to_pixel(
            jnp.float32(target_xy[0]), jnp.float32(target_xy[1]), h, w
        )
        path_px = graph.shortest_path((int(si), int(sj)), (int(ti), int(tj)))
        if not path_px:
            return [tuple(pos), tuple(target_xy)]
        pts = [
            geometry.pixel_to_position(i, j, h, w) for i, j in path_px
        ]
        pts[0] = tuple(pos)
        pts[-1] = tuple(target_xy)
        return pts

    # -- public API --------------------------------------------------------
    def reset(self):
        import jax

        self.state = self._reset_fn(jax.random.PRNGKey(0))
        robot_poses, cube_poses = self.poll_poses()
        self._mirror(robot_poses, cube_poses)
        obs, robot, group = self._observe_fn(self.state)
        self._awaiting = int(robot)
        return obs

    def step(self, flat_action):
        n = constants.LOCAL_MAP_PIXEL_WIDTH
        r = self._awaiting
        channel = flat_action // (n * n)
        pi = (flat_action // n) % n
        pj = flat_action % n
        pos = np.asarray(self.state.robot_pos[r])
        heading = float(self.state.robot_heading[r])
        dx = ((pj + 0.5) - n / 2) / constants.LOCAL_MAP_PIXELS_PER_METER
        dy = (n / 2 - (pi + 0.5)) / constants.LOCAL_MAP_PIXELS_PER_METER
        dist = math.hypot(dx, dy)
        theta = heading + math.atan2(-dx, dy)
        target = (pos[0] + dist * math.cos(theta), pos[1] + dist * math.sin(theta))

        waypoints = self._plan(r, target)
        self.drivers[r].new_action(waypoints, end_effector_action=channel == 1)

        # Drive until some robot idles (the sequential protocol).
        while not any(d.is_idle() for d in self.drivers):
            robot_poses, cube_poses = self.poll_poses()
            self._mirror(robot_poses, cube_poses)
            for k, d in enumerate(self.drivers):
                if not d.is_idle():
                    d.step(
                        tuple(np.asarray(self.state.robot_pos[k])),
                        float(self.state.robot_heading[k]),
                    )
            time.sleep(self.poll_dt)

        obs, robot, group = self._observe_fn(self.state)
        self._awaiting = int(robot)
        return obs


class _VectorTransport:  # pragma: no cover - hardware path
    """Anki Vector SDK motor transport."""

    WHEEL_MM = 1000.0

    def __init__(self, robot):
        self.robot = robot

    def set_wheel_speeds(self, left, right):
        self.robot.motors.set_wheel_motors(left * self.WHEEL_MM, right * self.WHEEL_MM)

    def set_lift(self, up):
        self.robot.behavior.set_lift_height(1.0 if up else 0.0)
