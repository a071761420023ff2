"""Golden parity vs the reference's checked-in shortest-path fixture
(shortest_paths/demo.py:39-48): same configuration-space bitmap, endpoints
from the demo, path cost must match the reference metric.

Skipped when the reference checkout isn't mounted.
"""

from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path("/root/reference/shortest_paths/sample-configuration-space.npy")

pytestmark = pytest.mark.skipif(
    not FIXTURE.exists(), reason="reference fixture not available"
)


def path_cost(path):
    p = np.asarray(path, float)
    return float(np.sum(np.linalg.norm(np.diff(p, axis=0), axis=1)))


def test_planners_match_reference_fixture():
    import jax.numpy as jnp

    from spatial_intention_maps_tpu.native import GridGraph
    from spatial_intention_maps_tpu.ops import paths, wavefront

    grid = np.load(FIXTURE).astype(np.uint8)
    # Demo endpoints (shortest_paths/demo.py:44).
    source = (75, 156)
    target = (131, 112)
    assert grid[source] and grid[target]

    # Native SPFA path.
    g = GridGraph(np.ascontiguousarray(grid, np.uint8))
    spfa_path = g.shortest_path(source, target)
    assert tuple(spfa_path[0]) == source and tuple(spfa_path[-1]) == target
    spfa_dist = g.shortest_path_distance(source, target)

    # Wavefront distance must equal the SPFA graph metric.
    freej = jnp.asarray(grid.astype(bool))
    img = np.asarray(wavefront.distance_image(freej, source[0], source[1], 4))
    assert abs(img[target] - spfa_dist) < 1e-2

    # On-device planner: waypoints, with LOS-feasible legs and near-optimal
    # total length (string pulling may differ from approximate_polygon by a
    # few pixels; demo.py itself allows atol=2 per waypoint).
    _, snap = wavefront.multi_source_distance(jnp.ones_like(freej), freej, 3)
    wps, num_wp, _ = paths.plan_path_pixels(
        freej, snap, jnp.asarray(source), jnp.asarray(target), 4
    )
    wps = np.asarray(wps)[: int(num_wp)]
    assert tuple(np.round(wps[0]).astype(int)) == source
    assert tuple(np.round(wps[-1]).astype(int)) == target
    ours = path_cost(wps)
    ref = path_cost(spfa_path)
    assert ours <= ref * 1.05 + 2.0, (ours, ref)
    # Each leg stays (essentially) in free space.  The reference's own
    # simplification (approximate_polygon tolerance=1, shortest_paths.pyx:140)
    # also allows ~1 px corner grazes, and the configuration space already
    # carries the robot-radius (~5 px) dilation margin — so require no DEEP
    # penetration: blind-fallback corner clips are bounded by the
    # BACKTRACE_STRIDE chord (< 4 px deep).
    for k in range(len(wps) - 1):
        p0, p1 = wps[k], wps[k + 1]
        n = int(max(abs(p1 - p0))) + 1
        blocked = 0
        for t in np.linspace(0, 1, n + 1):
            cell = np.round(p0 + t * (p1 - p0)).astype(int)
            blocked += 0 if grid[cell[0], cell[1]] else 1
        assert blocked <= 3, (k, blocked)
