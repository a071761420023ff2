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
from ..envs.types import CUBE_LIFTED, CUBE_REMOVED
from ..native import GridGraph
from . import POSE_SERVER_AUTHKEY, POSE_SERVER_PORTS
from .pure_pursuit import LOOKAHEAD_DISTANCE, TURN_THRESHOLD, arc_command, heading_error, lookahead_point

# Controller FSM states (envs.py:1564)
(IDLE, TURNING, DRIVING, SLOWING, ALIGNING, LIFTING, THROWING, PULLING,
 RESCUING, STOPPING) = (
    "idle", "turning", "driving", "slowing", "aligning", "lifting",
    "throwing", "pulling", "rescuing", "stopping",
)


class RobotDriver:
    """Pure-pursuit waypoint follower for one physical robot.

    transport: object with ``set_wheel_speeds(left, right)``,
    ``set_lift(up: bool)``, and (optionally, for throwing robots)
    ``set_lift_motor(speed)`` plus a ``lift_height`` readout in [0, 1] —
    the Vector SDK in production, a fake in tests.

    Implements the reference RealRobotController's recovery behaviors
    (envs.py:1563-1873): stuck-turn/drive back-off, slowing + aligning
    approach states, failed-lift abort (>20 ticks, envs.py:1675-1679),
    failed-throw pull-back-and-retry (envs.py:1690-1700, 1818-1826), and
    the dropped-lifted-cube monitor (envs.py:1747-1756).
    """

    STUCK_SECONDS = 3.0
    LIFT_TICK_LIMIT = 20       # envs.py:1677 (cube probably stuck on a wall)
    THROW_TICK_LIMIT = 10      # envs.py:1690-1700
    THROW_DONE_TICKS = 20      # envs.py:1686-1689
    PULL_TICKS = 10            # envs.py:1818-1826
    RESCUE_TICKS = 10          # envs.py:1702-1705
    CUBE_MONITOR_TICKS = 10    # envs.py:1747-1756
    SLOW_DIST = constants.CUBE_WIDTH     # driving -> slowing (envs.py:1646)
    SLOW_EPS = 0.002                     # slowing done, 2 mm (envs.py:1649)
    ALIGN_EPS = 0.001                    # aligning buffer, 1 mm (envs.py:1652)

    def __init__(self, transport, robot_type="lifting_robot"):
        self.transport = transport
        self.robot_type = robot_type
        self.state = IDLE
        self.waypoints = None
        self.end_effector_action = False
        self.carrying = False
        self.dropped_cube = False      # set by the lifted-cube monitor
        self.debug_data = None         # aruco overlay payload (server.py:124)
        self._ee_location = constants.end_effector_location(
            constants.ROBOT_BASE_LENGTHS[robot_type]
        )
        self._last_progress = (None, time.time())
        self._ticks = 0                # per-state tick counter
        self._cube_ticks = 0           # lifted/thrown cube monitor counter

    def new_action(self, waypoints, end_effector_action):
        self.waypoints = [tuple(w[:2]) for w in waypoints]
        self.end_effector_action = end_effector_action
        self.state = TURNING
        self._last_progress = (None, time.time())
        self._ticks = 0
        self._cube_ticks = 0

    def is_idle(self):
        return self.state == IDLE

    # -- auxiliary monitors -------------------------------------------------
    def _lift_height(self):
        """Lift readout if the transport provides one, else None (timer
        fallback keeps simple transports working)."""
        return getattr(self.transport, "lift_height", None)

    def monitor_lifted_cube(self, robot_position, estimated_cube_position):
        """Reference envs.py:1747-1756: a carried cube whose pose estimate
        strays >10 cm from the robot for >10 consecutive polls was dropped —
        lower the lift and flag the drop so the env can re-mark the cube."""
        if not self.carrying:
            return
        d = math.hypot(
            robot_position[0] - estimated_cube_position[0],
            robot_position[1] - estimated_cube_position[1],
        )
        if d > 0.1:
            self._cube_ticks += 1
        else:
            self._cube_ticks = 0
        if self._cube_ticks > self.CUBE_MONITOR_TICKS:
            self._cube_ticks = 0
            self.transport.set_lift(up=False)
            self.carrying = False
            self.dropped_cube = True

    # -- manipulation transitions (envs.py:1766-1830) -----------------------
    def _start_manipulation(self):
        self._ticks = 0
        if self.robot_type == "throwing_robot":
            # prepare_throw_cube + lift motor up (envs.py:1797-1800)
            lm = getattr(self.transport, "set_lift_motor", None)
            if lm is not None:
                lm(8.0)
            else:
                self.transport.set_lift(up=True)
            self.state = THROWING
        else:
            self.transport.set_lift(up=True)
            self.state = LIFTING
            self._lift_t0 = time.time()

    def step(self, position, heading):
        """One control tick given the latest pose estimate; issues motor
        commands through the transport."""
        if self.state == IDLE or self.waypoints is None:
            return

        # ---- manipulation states (pose-independent) ----
        if self.state == LIFTING:
            h = self._lift_height()
            self._ticks += 1
            done = (h is not None and h > 0.5) or (
                h is None and time.time() - self._lift_t0 > 1.5
            )
            if done:
                if self.robot_type == "rescue_robot":
                    self._ticks = 0
                    self.state = RESCUING
                else:
                    self.carrying = True
                    self.state = IDLE
            elif h is not None and self._ticks > self.LIFT_TICK_LIMIT:
                # Failed lift: cube is probably stuck against a wall
                # (envs.py:1675-1679) — abort the action.
                self.transport.set_lift(up=False)
                self.state = IDLE
            return
        if self.state == THROWING:
            h = self._lift_height()
            if h is not None and h > 0.5:
                self._ticks += 1
                if self._ticks > self.THROW_DONE_TICKS:
                    # _done_throwing (envs.py:1813-1817)
                    lm = getattr(self.transport, "set_lift_motor", None)
                    if lm is not None:
                        lm(0.0)
                    self.transport.set_lift(up=False)
                    self.state = IDLE
            else:
                self._ticks += 1
                if self._ticks > self.THROW_TICK_LIMIT:
                    # _failed_throwing: lift jammed -> back up and retry
                    # (envs.py:1690-1700, 1818-1821).
                    self._ticks = 0
                    lm = getattr(self.transport, "set_lift_motor", None)
                    if lm is not None:
                        lm(0.0)
                    self.transport.set_wheel_speeds(-0.04, -0.04)
                    self.state = PULLING
            return
        if self.state == PULLING:
            self._ticks += 1
            if self._ticks > self.PULL_TICKS:
                # _done_pulling: stop, raise the lift, try the throw again
                # (envs.py:1822-1826).
                self._ticks = 0
                self.transport.set_wheel_speeds(0.0, 0.0)
                lm = getattr(self.transport, "set_lift_motor", None)
                if lm is not None:
                    lm(8.0)
                else:
                    self.transport.set_lift(up=True)
                self.state = THROWING
            return
        if self.state == RESCUING:
            self._ticks += 1
            if self._ticks > self.RESCUE_TICKS:
                # _done_rescuing (envs.py:1828-1830)
                self.transport.set_lift(up=False)
                self.state = IDLE
            return

        # ---- navigation states ----
        target = lookahead_point(position, self.waypoints)
        goal = self.waypoints[-1]
        dist_to_goal = math.hypot(goal[0] - position[0], goal[1] - position[1])
        # Signed distance to the end-effector touch point (envs.py:1624).
        signed_dist = dist_to_goal - (
            self._ee_location + constants.CUBE_WIDTH / 2
        ) if self.end_effector_action else dist_to_goal
        err = heading_error(position, heading, target)
        self.debug_data = (target, None, err, tuple(position), heading)

        # Stuck detection (envs.py:1607-1640): no progress -> back off.
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
            if abs(err) < TURN_THRESHOLD:
                self.state = DRIVING
            else:
                w = 0.08 if err > 0 else -0.08
                self.transport.set_wheel_speeds(-w, w)
                return

        if self.state == DRIVING:
            if self.end_effector_action and signed_dist < self.SLOW_DIST:
                # _done_driving (envs.py:1768-1776): slow approach; hooks
                # robots align with the target cube before manipulating.
                self.state = (
                    ALIGNING if self.robot_type != "pushing_robot" else SLOWING
                )
            elif not self.end_effector_action and dist_to_goal < 0.01:
                self.transport.set_wheel_speeds(0.0, 0.0)
                if self.carrying and self.robot_type == "lifting_robot":
                    # Plain move while carrying just ends (drop only on
                    # channel-1 actions, envs.py:1782-1789).
                    pass
                self.state = IDLE
                return
            elif abs(err) > math.radians(45):
                self.state = TURNING
                return
            else:
                left, right = arc_command(position, heading, target)
                self.transport.set_wheel_speeds(left, right)
                sr = None
                if abs(math.sin(err)) > 1e-6:
                    sr = math.hypot(target[0] - position[0],
                                    target[1] - position[1]) / (2 * math.sin(err))
                self.debug_data = (target, sr, err, tuple(position), heading)
                return

        if self.state == SLOWING:
            # Speed proportional to remaining distance (envs.py:1625).
            if abs(signed_dist) < self.SLOW_EPS:
                self.transport.set_wheel_speeds(0.0, 0.0)
                if self.carrying and self.end_effector_action:
                    # Drop the carried cube here (envs.py:1782-1786).
                    self.transport.set_lift(up=False)
                    self.carrying = False
                self.state = IDLE
                return
            scale = max(0.1, min(1.0, 20.0 * abs(signed_dist)))
            sign = math.copysign(1.0, signed_dist)
            left, right = arc_command(position, heading, target)
            self.transport.set_wheel_speeds(
                sign * scale * left, sign * scale * right
            )
            return

        if self.state == ALIGNING:
            if self.carrying:
                # Carrying robots don't re-align on a cube; drop path goes
                # through slowing (envs.py:1768-1776 gates on potential_cube).
                self.state = SLOWING
                return
            if abs(err) < TURN_THRESHOLD and signed_dist < self.ALIGN_EPS:
                # _done_aligning (envs.py:1793-1800).
                self.transport.set_wheel_speeds(0.0, 0.0)
                self._start_manipulation()
                return
            scale = max(0.1, min(1.0, 20.0 * abs(signed_dist)))
            sign = math.copysign(1.0, signed_dist) if abs(signed_dist) > self.ALIGN_EPS else 1.0
            left, right = arc_command(position, heading, target)
            self.transport.set_wheel_speeds(
                sign * scale * left, sign * scale * right
            )
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
                 transports=None, poll_hz=10.0, conns=None):
        import jax

        self.params = params
        self.poll_dt = 1.0 / poll_hz
        if conns is None:  # pragma: no cover - hardware path
            size = "large" if params.env_name.startswith("large") else "small"
            conns = [
                Client(("localhost", port), authkey=POSE_SERVER_AUTHKEY)
                for port in POSE_SERVER_PORTS[size]
            ]
        self.conns = conns
        self.robot_ids = list(real_robot_indices)
        self.cube_ids = list(real_cube_indices)
        if transports is None:  # pragma: no cover - hardware path
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
        self._awaiting = 0
        self._steps = 0
        self._carried_cube = [None] * len(self.drivers)

    # -- pose mirroring (update_poses, envs.py:389-432) -------------------
    def poll_poses(self, debug_data=None):
        """``debug_data``: optional per-robot overlay payloads forwarded to
        the pose servers for rendering (reference envs.py:394-399 sends the
        controllers' waypoints/pursuit data; aruco/server.py:124-145 draws
        them on the debug window)."""
        robot_poses, cube_poses = {}, {}
        for conn in self.conns:
            conn.send(debug_data)
            rp, cp = conn.recv()
            if rp:
                robot_poses.update(rp)
            if cp:
                cube_poses.update(cp)
        return robot_poses, cube_poses

    def _nearest_cube(self, robot_index, cube_poses):
        pos = np.asarray(self.state.robot_pos[robot_index])
        best, best_d = None, np.inf
        for cid, pose in cube_poses.items():
            d = math.hypot(pose["position"][0] - pos[0], pose["position"][1] - pos[1])
            if d < best_d:
                best, best_d = cid, d
        return best

    def _mirror(self, robot_poses, cube_poses):
        import jax.numpy as jnp

        s = self.state
        # np.array (not asarray): device arrays view as read-only buffers.
        rpos = np.array(s.robot_pos)
        rhead = np.array(s.robot_heading)
        for k, rid in enumerate(self.robot_ids):
            pose = robot_poses.get(rid)
            if pose:
                rpos[k] = pose["position"]
                rhead[k] = pose["heading"]
        cpos = np.array(s.cube_pos)
        chead = np.array(s.cube_heading)
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

    # -- host-side sequential-protocol bookkeeping -------------------------
    def _group_slot(self, r):
        """Flat robot index -> (group, index-within-group)."""
        gi = self.params.robot_groups[r]
        j = sum(1 for rr in range(r) if self.params.robot_groups[rr] == gi)
        return gi, j

    def _nested(self, fill=None):
        return [
            [fill] * sum(1 for g in self.params.robot_groups if g == gi)
            for gi in range(self.params.num_groups)
        ]

    def _sync_state_books(self):
        """Push the host drivers' truth (awaiting robot, waypoint progress,
        carried cubes) into the mirrored EnvState so the jitted mapper
        renders correct intention/history channels for every teammate
        (reference: controllers expose get_intention_path, envs.py:1474)."""
        import jax.numpy as jnp

        s = self.state
        r_n = len(self.drivers)
        aw = np.zeros(r_n, bool)
        aw[self._awaiting] = True
        wp_index = np.asarray(s.wp_index).copy()
        for k, d in enumerate(self.drivers):
            if d.is_idle() or not d.waypoints:
                continue
            # Advance past consumed waypoints: everything behind the
            # lookahead circle no longer renders in the intention map.
            pos = np.asarray(s.robot_pos[k])
            idx = int(wp_index[k])
            num = int(np.asarray(s.num_wp[k]))
            while idx < num - 1 and math.hypot(
                d.waypoints[min(idx, len(d.waypoints) - 1)][0] - pos[0],
                d.waypoints[min(idx, len(d.waypoints) - 1)][1] - pos[1],
            ) < LOOKAHEAD_DISTANCE:
                idx += 1
            wp_index[k] = idx
        cube_status = np.asarray(s.cube_status).copy()
        # Lifted-flag is derived fresh from the host's carried-cube truth so
        # a dropped cube reverts to available (removed cubes stay removed).
        cube_status[cube_status == CUBE_LIFTED] = 0  # CUBE_AVAILABLE
        for k, cid in enumerate(self._carried_cube):
            if cid is not None and cid in self.cube_ids:
                cube_status[self.cube_ids.index(cid)] = CUBE_LIFTED
        self.state = s.replace(
            awaiting=jnp.asarray(aw),
            wp_index=jnp.asarray(wp_index),
            cube_status=jnp.asarray(cube_status),
        )

    def _write_plan(self, r, waypoints, channel):
        """Mirror the host-planned waypoint polyline into the EnvState's
        per-robot plan fields (what inject_action does in sim,
        env.py:380-391) so teammates' intention maps see this action."""
        import jax.numpy as jnp

        k = constants.MAX_WAYPOINTS
        wps = np.asarray(waypoints, np.float32)[:k]
        pad = np.tile(wps[-1][None], (k - len(wps), 1))
        wps_full = np.concatenate([wps, pad], axis=0)
        seg = wps_full[1:] - wps_full[:-1]
        headings = np.arctan2(seg[:, 1], seg[:, 0])
        wp_headings = np.concatenate(
            [[float(self.state.robot_heading[r])], headings]
        ).astype(np.float32)
        s = self.state
        self.state = s.replace(
            waypoints=s.waypoints.at[r].set(jnp.asarray(wps_full)),
            wp_headings=s.wp_headings.at[r].set(jnp.asarray(wp_headings)),
            num_wp=s.num_wp.at[r].set(len(wps)),
            wp_index=s.wp_index.at[r].set(1),
        )

    def _remove_receptacle_cubes(self):
        """Mark mirrored cubes inside the receptacle as removed
        (reference envs.py:419-430: real cubes seen in the receptacle leave
        tracking). Returns the number of removed cubes."""
        import jax.numpy as jnp

        if not self.params.has_receptacle:
            return 0
        s = self.state
        rx, ry = self.params.receptacle_position
        half = constants.RECEPTACLE_WIDTH / 2
        cpos = np.asarray(s.cube_pos)
        status = np.asarray(s.cube_status).copy()
        for k in range(len(self.cube_ids)):
            if status[k] == CUBE_REMOVED:
                continue
            if (abs(cpos[k, 0] - rx) < half and abs(cpos[k, 1] - ry) < half):
                status[k] = CUBE_REMOVED
                cid = self.cube_ids[k]
                for j, carried in enumerate(self._carried_cube):
                    if carried == cid:
                        self._carried_cube[j] = None
        self.state = s.replace(cube_status=jnp.asarray(status))
        return int(np.sum(status == CUBE_REMOVED))

    # -- public API (reference-shaped, envs.py:187-222 / enjoy.py:24-31) ---
    def reset(self):
        import jax

        self.state = self._reset_fn(jax.random.PRNGKey(0))
        robot_poses, cube_poses = self.poll_poses()
        self._mirror(robot_poses, cube_poses)
        self._awaiting = 0
        self._steps = 0
        self._carried_cube = [None] * len(self.drivers)
        return self.get_state()

    def get_state(self):
        """Nested [group][robot] observations: the awaiting robot's obs,
        None elsewhere (SimEnv.get_state parity)."""
        self._sync_state_books()
        obs, robot, group = self._observe_fn(self.state)
        out = self._nested()
        gi, j = self._group_slot(self._awaiting)
        out[gi][j] = np.asarray(obs)
        return out

    def step(self, action, max_seconds=None):
        """One sequential-protocol step: issue the awaiting robot's action,
        drive the physical team until some robot is next (a driver idles, or
        an idle robot has no outstanding action yet), then return
        ``(state, reward, done, info)`` in the reference's nested shapes.

        Rewards are ``None`` (the real env does not score — reference
        enjoy.py:28 discards them); ``done`` is all-cubes-in-receptacle or
        the per-robot inactivity cutoff."""
        # Locate the acting robot's flat action in the nested list.
        r, flat_action = None, None
        for gi, group in enumerate(action):
            for j, a in enumerate(group):
                if a is None:
                    continue
                count = -1
                for rr in range(len(self.drivers)):
                    if self.params.robot_groups[rr] == gi:
                        count += 1
                        if count == j:
                            r, flat_action = rr, int(a)
        assert r == self._awaiting, (r, self._awaiting)

        n = constants.LOCAL_MAP_PIXEL_WIDTH
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
        self._write_plan(r, waypoints, channel)
        self._steps += 1

        # Drive until a robot needs its next action: either a driver that
        # was busy goes idle, or (start of episode) some robot has never
        # been issued an action — the sim's set_awaiting picks the first
        # idle robot immediately (env.py:477-486).
        t0 = time.time()
        carried = self._carried_cube
        while True:
            idle = [k for k, d in enumerate(self.drivers) if d.is_idle()]
            if idle:
                self._awaiting = idle[0]
                break
            if max_seconds is not None and time.time() - t0 > max_seconds:
                for d in self.drivers:
                    d.transport.set_wheel_speeds(0.0, 0.0)
                    d.state = IDLE
                self._awaiting = 0
                break
            debug = [d.debug_data for d in self.drivers]
            robot_poses, cube_poses = self.poll_poses(debug)
            self._mirror(robot_poses, cube_poses)
            for k, d in enumerate(self.drivers):
                was_carrying = d.carrying
                pos_k = tuple(np.asarray(self.state.robot_pos[k]))
                if not d.is_idle():
                    d.step(pos_k, float(self.state.robot_heading[k]))
                # Carried-cube bookkeeping + dropped-cube monitor
                # (envs.py:419-430 + 1747-1756).
                if d.carrying and not was_carrying:
                    carried[k] = self._nearest_cube(k, cube_poses)
                if d.carrying and carried[k] is not None and carried[k] in cube_poses:
                    d.monitor_lifted_cube(
                        pos_k, cube_poses[carried[k]]["position"]
                    )
                if d.dropped_cube:
                    d.dropped_cube = False
                    carried[k] = None
            time.sleep(self.poll_dt)

        # Refresh the mirror once more so observations see final poses.
        robot_poses, cube_poses = self.poll_poses(
            [d.debug_data for d in self.drivers]
        )
        self._mirror(robot_poses, cube_poses)
        removed = self._remove_receptacle_cubes()

        cutoff = self.params.inactivity_cutoff
        done = removed >= len(self.cube_ids) or self._steps >= cutoff
        info = {"steps": self._steps, "total_cubes": removed}
        reward = self._nested()
        state = self.get_state() if not done else self._nested()
        return state, reward, done, info


class _VectorTransport:  # pragma: no cover - hardware path
    """Anki Vector SDK motor transport."""

    WHEEL_MM = 1000.0

    def __init__(self, robot):
        self.robot = robot

    def set_wheel_speeds(self, left, right):
        self.robot.motors.set_wheel_motors(left * self.WHEEL_MM, right * self.WHEEL_MM)

    def set_lift(self, up):
        self.robot.behavior.set_lift_height(1.0 if up else 0.0)
