"""Pure-pursuit steering for the physical differential-drive robots.

Math parity with RealRobotController's lookahead tracking
(envs.py:1505, 1653-1668, 1838-1868): a 10 cm lookahead circle is
intersected with the remaining waypoint polyline; the intersection furthest
along the path is the steering target, and wheel speeds follow the arc
through it.  Pure functions — unit-testable without hardware.
"""

import math

LOOKAHEAD_DISTANCE = 0.1  # 10 cm (envs.py:1505)
TURN_THRESHOLD = math.radians(5)  # envs.py:1506


def circle_segment_intersections(center, radius, p0, p1):
    """Intersections of a circle with segment p0->p1, as parametric ts."""
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    fx, fy = p0[0] - center[0], p0[1] - center[1]
    a = dx * dx + dy * dy
    b = 2 * (fx * dx + fy * dy)
    c = fx * fx + fy * fy - radius * radius
    if a < 1e-12:
        return []
    disc = b * b - 4 * a * c
    if disc < 0:
        return []
    sq = math.sqrt(disc)
    out = []
    for t in ((-b - sq) / (2 * a), (-b + sq) / (2 * a)):
        if 0.0 <= t <= 1.0:
            out.append(t)
    return out


def lookahead_point(position, waypoints, lookahead=LOOKAHEAD_DISTANCE):
    """The point on the waypoint polyline one lookahead ahead of the robot:
    the furthest-along intersection of the lookahead circle with the path,
    falling back to the final waypoint when none exists — or when the goal
    itself is inside the lookahead circle (otherwise the only intersection
    lies behind the robot and pursuit would turn away from the goal)."""
    last = tuple(waypoints[-1][:2])
    if math.hypot(last[0] - position[0], last[1] - position[1]) <= lookahead:
        return last
    best = None
    for k in range(len(waypoints) - 1):
        p0, p1 = waypoints[k], waypoints[k + 1]
        for t in circle_segment_intersections(position, lookahead, p0, p1):
            best = (
                p0[0] + t * (p1[0] - p0[0]),
                p0[1] + t * (p1[1] - p0[1]),
            )
    if best is None:
        best = last
    return best


def arc_command(position, heading, target, wheel_base=0.048, speed=0.06):
    """Differential wheel speeds (left, right) m/s driving the pure-pursuit
    arc through ``target``."""
    dx = target[0] - position[0]
    dy = target[1] - position[1]
    # Target in robot frame.
    lx = math.cos(heading) * dx + math.sin(heading) * dy
    ly = -math.sin(heading) * dx + math.cos(heading) * dy
    d2 = lx * lx + ly * ly
    if d2 < 1e-12:
        return 0.0, 0.0
    if abs(ly) < 1e-9:
        return (speed, speed) if lx > 0 else (-speed, -speed)
    # Arc curvature through the target: kappa = 2*ly / d^2.
    kappa = 2.0 * ly / d2
    direction = 1.0 if lx >= 0 else -1.0
    v = direction * speed
    omega = v * kappa
    return v - omega * wheel_base / 2, v + omega * wheel_base / 2


def heading_error(position, heading, target):
    return _wrap(math.atan2(target[1] - position[1], target[0] - position[0]) - heading)


def _wrap(a):
    return (a + math.pi) % (2 * math.pi) - math.pi
