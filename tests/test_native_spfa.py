"""Native C++ SPFA library: build, exactness vs the wavefront kernel, and
API parity (shortest_path / shortest_path_distance / shortest_path_image,
shortest_paths.pyx surface)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spatial_intention_maps_tpu.native import GridGraph
from spatial_intention_maps_tpu.ops import wavefront


@pytest.fixture(scope="module")
def grid():
    free = np.ones((40, 48), np.uint8)
    free[12, 6:42] = 0
    free[28, 0:30] = 0
    return free


def test_distance_image_matches_wavefront(grid):
    g = GridGraph(grid)
    img = g.shortest_path_image((4, 10))
    wf = np.asarray(
        wavefront.distance_image(jnp.asarray(grid.astype(bool)), 4, 10, 4)
    )
    reachable = img >= 0
    np.testing.assert_allclose(img[reachable], wf[reachable], atol=1e-3)
    assert np.all(wf[~reachable] > 1e8)


def test_distance_and_path(grid):
    g = GridGraph(grid)
    d = g.shortest_path_distance((4, 10), (36, 40))
    assert d > 0
    path = g.shortest_path((4, 10), (36, 40))
    assert path[0] == [4, 10]
    assert path[-1] == [36, 40]
    assert len(path) >= 3  # must route around both walls
    # Each simplified leg is collision free (the library checks LOS).
    for k in range(len(path) - 1):
        p0, p1 = np.array(path[k]), np.array(path[k + 1])
        n = int(max(abs(p1 - p0))) + 1
        for t in np.linspace(0, 1, n + 1):
            cell = np.round(p0 + t * (p1 - p0)).astype(int)
            assert grid[cell[0], cell[1]] == 1

    # Unreachable target
    grid2 = grid.copy()
    grid2[20, :] = 0
    grid2[12, :] = 0
    g2 = GridGraph(grid2)
    assert g2.shortest_path((4, 10), (36, 40)) == []
    assert g2.shortest_path_distance((4, 10), (36, 40)) == -1.0


def test_pure_pursuit_lookahead():
    from spatial_intention_maps_tpu.real import pure_pursuit as pp

    waypoints = [(0.0, 0.0), (0.5, 0.0), (0.5, 0.5)]
    # Robot on the first leg: lookahead point is 10 cm ahead on that leg.
    tgt = pp.lookahead_point((0.1, 0.0), waypoints)
    assert abs(tgt[0] - 0.2) < 1e-6 and abs(tgt[1]) < 1e-6
    # Near the corner: the intersection on the second leg wins.
    tgt = pp.lookahead_point((0.5, 0.05), waypoints)
    assert abs(tgt[0] - 0.5) < 1e-6 and tgt[1] > 0.1
    # Past everything: falls back to the final waypoint.
    tgt = pp.lookahead_point((2.0, 2.0), waypoints)
    assert tgt == (0.5, 0.5)
    # Arc command turns toward a leftward target.
    left, right = pp.arc_command((0.0, 0.0), 0.0, (0.2, 0.2))
    assert right > left
