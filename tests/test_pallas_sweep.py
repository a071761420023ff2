"""Pallas streaming sweep vs the C++ SPFA oracle.

On TPU the Mosaic-compiled kernel runs at production shapes; on the CPU
mesh the same kernel LOGIC runs in Pallas interpreter mode on reduced
shapes (VERDICT r4 #9) — the interpreter emulates the double-buffered DMA
and semaphores, so logic drift is caught without hardware while lowering
stays TPU-covered.
"""

import jax
import jax.numpy as jnp
import numpy as np
from spatial_intention_maps_tpu.native import GridGraph
from spatial_intention_maps_tpu.ops import wavefront

ON_TPU = jax.default_backend() == "tpu"
# Interpreter mode is ~1000x slower: shrink shapes off-TPU.
H, W, B = (184, 232, 16) if ON_TPU else (40, 56, 2)

def test_stream_sweep_matches_spfa():
    from spatial_intention_maps_tpu.ops.pallas_sweep import sweep_pallas_stream

    rng = np.random.RandomState(3)
    free = np.ones((B, H, W), bool)
    seeds = []
    for b in range(B):
        free[b, rng.randint(10, H - 10), slice(*sorted(rng.randint(0, W, 2)))] = False
        free[b, rng.randint(10, H - 10), rng.randint(0, W // 4):] = False
        s = (rng.randint(5, H - 5), rng.randint(5, W - 5))
        free[b][s] = True
        seeds.append(s)
    dist = np.full((B, H, W), 1e9, np.float32)
    for b, s in enumerate(seeds):
        dist[b][s] = 0.0
    payload = np.zeros((B, H, W), np.int32)

    d, p = sweep_pallas_stream(
        jnp.asarray(dist), jnp.asarray(payload), jnp.asarray(free), 4
    )
    dp = np.asarray(d)
    for b in range(B):
        ref = GridGraph(free[b].astype(np.uint8)).shortest_path_image(seeds[b])
        reach = ref >= 0
        reach_p = dp[b] < wavefront.UNREACHABLE_THRESHOLD
        assert (reach == reach_p).all()
        assert np.abs(dp[b][reach] - ref[reach]).max() < 1e-2


def test_stream_payload_snap():
    from spatial_intention_maps_tpu.ops.pallas_sweep import sweep_pallas_stream

    b_n = min(B, 8)
    src = np.zeros((b_n, H, W), bool)
    src[:, H // 3: 2 * H // 3, W // 4: 3 * W // 4] = True
    dist0 = jnp.where(jnp.asarray(src), 0.0, 1e9).astype(jnp.float32)
    idx = jnp.tile(
        jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W), (b_n, 1, 1)
    )
    pay0 = jnp.where(jnp.asarray(src), idx, 0)
    ones = jnp.ones((b_n, H, W), bool)
    _, pl_ = sweep_pallas_stream(dist0, pay0, ones, 3)
    pp = np.asarray(pl_)
    # Every cell's claimed nearest source must actually be a source cell.
    claimed_valid = src[np.arange(b_n)[:, None, None], pp // W, pp % W]
    assert claimed_valid.mean() > 0.999
