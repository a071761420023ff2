"""Pallas streaming sweep vs the C++ SPFA oracle (TPU only; skipped on CPU,
where sweep_batched falls back to the lax path already covered by
test_wavefront)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu.native import GridGraph
from spatial_intention_maps_tpu.ops import wavefront

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="Pallas TPU kernel needs a TPU backend"
)


def test_stream_sweep_matches_spfa():
    from spatial_intention_maps_tpu.ops.pallas_sweep import sweep_pallas_stream

    H, W, B = 184, 232, 16
    rng = np.random.RandomState(3)
    free = np.ones((B, H, W), bool)
    seeds = []
    for b in range(B):
        free[b, rng.randint(20, H - 20), slice(*sorted(rng.randint(0, W, 2)))] = False
        free[b, rng.randint(20, H - 20), rng.randint(0, 50):] = False
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

    H, W, B = 184, 232, 8
    src = np.zeros((B, H, W), bool)
    src[:, 60:120, 60:160] = True
    dist0 = jnp.where(jnp.asarray(src), 0.0, 1e9).astype(jnp.float32)
    idx = jnp.tile(jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W), (B, 1, 1))
    pay0 = jnp.where(jnp.asarray(src), idx, 0)
    ones = jnp.ones((B, H, W), bool)
    _, pl_ = sweep_pallas_stream(dist0, pay0, ones, 3)
    pp = np.asarray(pl_)
    # Every cell's claimed nearest source must actually be a source cell.
    claimed_valid = src[np.arange(B)[:, None, None], pp // W, pp % W]
    assert claimed_valid.mean() > 0.999
