"""Wavefront distance-field tests against a Dijkstra oracle.

The oracle reproduces the reference grid-graph metric: 8-connected, step
costs {1, sqrt(2)}, edges only between free cells
(shortest_paths/shortest_paths.pyx:26-67).
"""

import heapq
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spatial_intention_maps_tpu.ops import wavefront
from spatial_intention_maps_tpu.ops.paths import backtrace, plan_path_pixels
from spatial_intention_maps_tpu.envs import geometry
from spatial_intention_maps_tpu import constants


def dijkstra_oracle(free, src):
    h, w = free.shape
    dist = np.full((h, w), np.inf)
    if not free[src]:
        return dist
    dist[src] = 0.0
    pq = [(0.0, src)]
    while pq:
        d, (i, j) = heapq.heappop(pq)
        if d > dist[i, j]:
            continue
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                ni, nj = i + di, j + dj
                if 0 <= ni < h and 0 <= nj < w and free[ni, nj]:
                    nd = d + (math.sqrt(2) if di and dj else 1.0)
                    if nd < dist[ni, nj] - 1e-9:
                        dist[ni, nj] = nd
                        heapq.heappush(pq, (nd, (ni, nj)))
    return dist


def check_grid(free, src, num_pass_pairs=3):
    oracle = dijkstra_oracle(free, src)
    got = np.asarray(
        wavefront.distance_image(jnp.asarray(free), src[0], src[1], num_pass_pairs)
    )
    reachable = np.isfinite(oracle)
    assert np.all(got[~reachable] > 1e8), "unreachable cells must stay sentinel"
    np.testing.assert_allclose(got[reachable], oracle[reachable], atol=1e-3)


def test_open_grid():
    free = np.ones((24, 40), bool)
    check_grid(free, (3, 5), num_pass_pairs=1)


def test_single_wall():
    free = np.ones((32, 32), bool)
    free[10, 4:28] = False
    check_grid(free, (2, 16))


def test_u_trap():
    # Geodesics must wind around a U-shaped obstacle (several direction
    # reversals).
    free = np.ones((40, 40), bool)
    free[10:30, 10] = False
    free[10:30, 30] = False
    free[29, 10:31] = False
    check_grid(free, (20, 20), num_pass_pairs=4)


def test_random_grids_vs_oracle():
    rng = np.random.RandomState(0)
    for trial in range(2):
        free = rng.rand(24, 28) > 0.25
        free[1, 1] = True
        # Keep a connected-ish border free
        free[0, :] = True
        check_grid(free, (1, 1), num_pass_pairs=6)


@pytest.mark.parametrize("env_name", ["small_divider", "large_tunnels"])
def test_reference_layouts_exact(env_name):
    """On the actual room layouts, 3 sweep pairs reach the Dijkstra fixpoint."""
    room_w = 0.5 if env_name.startswith("small") else 1.0
    h, w = constants.global_map_shape(1.0, room_w)
    layout = geometry.sample_layout(jax.random.PRNGKey(0), env_name, 1.0, room_w, True)
    wall, _ = geometry.rasterize_layout(layout, h, w, 1.0, room_w, (0.425, room_w / 2 - 0.075))
    mask = geometry.room_mask(h, w, 1.0, room_w)
    free = np.asarray(mask & ~wall)
    # source inside the room, left/bottom region (cube side of the dividers)
    src = (h // 2 + 18, w // 2 - 38)
    assert free[src]
    check_grid(free, src, num_pass_pairs=3)


def test_multi_source_snap():
    free = np.zeros((16, 16), bool)
    free[4:12, 4:12] = True
    dist, payload = wavefront.multi_source_distance(
        jnp.ones((16, 16), bool), jnp.asarray(free)
    )
    # Snap an outside cell to the nearest free cell.
    i, j = wavefront.snap_to_valid(payload, 0, 0)
    assert (int(i), int(j)) == (4, 4)
    i, j = wavefront.snap_to_valid(payload, 15, 8)
    assert int(i) == 11 and 4 <= int(j) <= 11
    # Valid cells snap to themselves.
    i, j = wavefront.snap_to_valid(payload, 6, 7)
    assert (int(i), int(j)) == (6, 7)


def test_backtrace_reaches_seed():
    free = np.ones((32, 32), bool)
    free[16, 4:28] = False
    freej = jnp.asarray(free)
    dist = wavefront.distance_image(freej, 28, 16, 4)
    path, path_len = backtrace(dist, (4, 16))
    path = np.asarray(path)
    n = int(path_len)
    assert tuple(path[0]) == (4, 16)
    assert tuple(path[n - 1]) == (28, 16)
    # Path must be 8-connected and stay on free cells.
    for k in range(1, n):
        assert max(abs(path[k] - path[k - 1])) <= 1
        assert free[tuple(path[k])]


def test_plan_path_pixels():
    free = np.ones((48, 48), bool)
    free[24, 8:44] = False
    freej = jnp.asarray(free)
    _, payload = wavefront.multi_source_distance(jnp.ones((48, 48), bool), freej)
    wps, num_wp, _ = plan_path_pixels(freej, payload, jnp.array([40, 24]), jnp.array([8, 24]))
    wps = np.asarray(wps)
    n = int(num_wp)
    assert n >= 3  # must route around the wall
    assert tuple(wps[0].astype(int)) == (40, 24)
    assert tuple(wps[n - 1].astype(int)) == (8, 24)
    # All simplified waypoints lie on free cells and consecutive segments are
    # collision free.
    for k in range(n):
        assert free[int(round(wps[k][0])), int(round(wps[k][1]))]


def test_simplify_path_batched_matches_vmapped():
    """The MXU one-hot LOS string pull must produce EXACTLY the waypoints of
    the per-env gather implementation (same stride-4 candidates, same greedy
    scan, boolean cell reads are exact in bf16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spatial_intention_maps_tpu import constants
    from spatial_intention_maps_tpu.ops import paths, wavefront

    rng = np.random.RandomState(0)
    m, h, w = 6, 48, 64
    frees, paths_b, lens = [], [], []
    for e in range(m):
        free = np.ones((h, w), bool)
        # random rectangular obstacles
        for _ in range(4):
            i0, j0 = rng.randint(0, h - 10), rng.randint(0, w - 10)
            free[i0:i0 + rng.randint(2, 8), j0:j0 + rng.randint(2, 8)] = False
        si, sj = 2, 2
        ti, tj = h - 3, w - 3
        free[si, sj] = free[ti, tj] = True
        dist = wavefront.distance_image(jnp.asarray(free), ti, tj, 3)
        path, plen = paths.backtrace(dist, jnp.array([si, sj]))
        frees.append(free)
        paths_b.append(np.asarray(path))
        lens.append(int(plen))

    free_b = jnp.asarray(np.stack(frees))
    path_b = jnp.asarray(np.stack(paths_b))
    len_b = jnp.asarray(np.array(lens, np.int32))

    wps_b, n_b = paths.simplify_path_batched(free_b, path_b, len_b)
    for e in range(m):
        wps_ref, n_ref = paths.simplify_path(free_b[e], path_b[e], len_b[e])
        assert int(n_b[e]) == int(n_ref), e
        np.testing.assert_array_equal(
            np.asarray(wps_b[e][: int(n_ref)]),
            np.asarray(wps_ref[: int(n_ref)]),
            err_msg=f"env {e}",
        )


def test_backtrace_matches_gather_formulation():
    """The parent-direction-image backtrace (one gather per walk step) must
    reproduce the original 8-neighbor-gather steepest descent exactly —
    same neighbor order, same argmin first-wins tie-breaking, same edge
    clipping — on structured and on adversarial (tie-heavy) dist images."""
    import jax.numpy as jnp
    import numpy as np

    from spatial_intention_maps_tpu import constants
    from spatial_intention_maps_tpu.ops import paths, wavefront

    neigh = np.array(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    )

    def backtrace_gather(dist_img, start, num_steps):
        # the original formulation, kept here as the regression oracle
        dist = np.asarray(dist_img)
        h, w = dist.shape
        cur = np.array(start)
        path = [tuple(cur)]
        for _ in range(num_steps - 1):
            ni = np.clip(cur[0] + neigh[:, 0], 0, h - 1)
            nj = np.clip(cur[1] + neigh[:, 1], 0, w - 1)
            nd = dist[ni, nj]
            k = int(np.argmin(nd))
            if not nd[k] < dist[cur[0], cur[1]]:
                break
            cur = np.array([ni[k], nj[k]])
            path.append(tuple(cur))
        return path

    rng = np.random.RandomState(3)
    cases = []
    free = np.ones((40, 48), bool)
    free[20, 4:44] = False
    dist = wavefront.distance_image(jnp.asarray(free), 34, 24, 4)
    cases.append((dist, (4, 24)))
    # tie-heavy integer plateaus exercise argmin tie-breaking
    cases.append((jnp.asarray(rng.randint(0, 6, (32, 32)).astype(np.float32)),
                  (30, 1)))
    for dist, start in cases:
        path, plen = paths.backtrace(dist, jnp.array(start))
        ref = backtrace_gather(dist, start, constants.BACKTRACE_MAX_STEPS)
        n = int(plen)
        assert n == len(ref)
        np.testing.assert_array_equal(np.asarray(path[:n]), np.array(ref))
