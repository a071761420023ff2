"""Equivalence of the lane-major Pallas substep kernel vs the lax.scan path.

The kernel (ops/pallas_substep.py) re-lays-out dynamics.substep lane-major;
these tests drive REAL mid-action states (reset + fused rounds with random
actions) through both engines and require the full mutable state to match.
Interpret mode keeps this on the CPU mesh; the TPU compiled path is covered
by the benchmark/training drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu.envs import env as env_core
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.ops import pallas_substep
from spatial_intention_maps_tpu.train.fused import FusedLoop


def _mid_action_batch(params, b, rounds=3, seed=0):
    """A batch of envs a few fused rounds in (robots mid-drive, some
    carrying), which exercises FSM branches far better than fresh resets."""
    loop = FusedLoop(
        params, num_envs=b, num_channels=params.num_state_channels,
        substeps_per_round=64, service_capacity=b,
    )
    ls = loop.init(jax.random.PRNGKey(seed))
    for _ in range(rounds):
        ls, _, _ = loop.round(ls, None, 1.0, False)  # eps=1: random actions
    return ls.env


def _assert_states_match(params, ref, out):
    mismatches = []
    for name, *_ in pallas_substep._MUT:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(out, name))
        if a.dtype == np.bool_ or np.issubdtype(a.dtype, np.integer):
            ok = np.array_equal(a, b)
        else:
            ok = np.allclose(a, b, rtol=0, atol=1e-5)
        if not ok:
            bad = np.argwhere(
                ~np.isclose(a, b, rtol=0, atol=1e-5)
                if a.dtype == np.float32
                else (a != b)
            )
            mismatches.append((name, bad[:5], a.ravel()[:3], b.ravel()[:3]))
    assert not mismatches, mismatches


@pytest.mark.parametrize(
    "robot_config, env_name, room",
    [
        ([{"lifting_robot": 4}], "small_divider", (1.0, 0.5)),
        ([{"pushing_robot": 2}], "small_empty", (1.0, 0.5)),
        ([{"rescue_robot": 2}], "small_empty", (1.0, 0.5)),
        ([{"lifting_robot": 2}, {"pushing_robot": 2}], "large_empty", (1.0, 1.0)),
        ([{"lifting_robot": 2}, {"throwing_robot": 2}], "large_empty", (1.0, 1.0)),
        ([{"throwing_robot": 2}], "small_empty", (1.0, 0.5)),
    ],
)
def test_kernel_matches_scan(robot_config, env_name, room):
    is_rescue = robot_config == [{"rescue_robot": 2}]
    params = EnvParams.from_robot_config(
        robot_config,
        env_name=env_name,
        room_length=room[0],
        room_width=room[1],
        num_cubes=6,
        use_intention_map=True,
        # rescue teams have no receptacle (types.py:90 invariant)
        use_shortest_path_to_receptacle_map=not is_rescue,
        use_distance_to_receptacle_map=False,
    )
    assert pallas_substep.supports(params)
    b = 8
    env = _mid_action_batch(params, b)

    n = 64
    ref = jax.jit(
        jax.vmap(lambda s: env_core.run_substeps(params, s, n, refresh=False))
    )(env)
    out = pallas_substep.run_substeps_pallas(
        params, env, n, interpret=True, block_b=4
    )
    _assert_states_match(params, ref, out)


def test_fused_loop_with_kernel_matches_scan_path():
    """The integrated dispatch: FusedLoop(use_pallas_substep=True) must
    produce the same LoopState trajectory as the scan path round for round
    (random-action rounds; interpret mode on the CPU mesh)."""
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 2}], env_name="small_empty",
        room_length=1.0, room_width=0.5, num_cubes=4,
        use_intention_map=True,
    )
    b = 8
    kwargs = dict(
        num_envs=b, num_channels=params.num_state_channels,
        substeps_per_round=64, service_capacity=b,
    )
    loop_scan = FusedLoop(params, use_pallas_substep=False, **kwargs)
    loop_pl = FusedLoop(params, use_pallas_substep=True, **kwargs)
    ls_a = loop_scan.init(jax.random.PRNGKey(3))
    ls_b = loop_pl.init(jax.random.PRNGKey(3))
    for _ in range(4):
        ls_a, _, ma = loop_scan.round(ls_a, None, 1.0, False)
        ls_b, _, mb = loop_pl.round(ls_b, None, 1.0, False)
    _assert_states_match(params, ls_a.env, ls_b.env)
    assert int(ma["served"]) == int(mb["served"])


def test_kernel_jaxpr_is_gather_and_scatter_free():
    """Mosaic only lowers 2D gathers and no scatters at all; jnp indexing
    that mixes None with an int index silently emits >2D lax.gather ops and
    .at[].set always emits lax.scatter (both round-3 TPU compile failures).
    Guard the whole substep trace against either reappearing."""
    params = EnvParams.from_robot_config(
        [{"lifting_robot": 2}, {"pushing_robot": 2}], env_name="large_empty",
        room_length=1.0, room_width=1.0, num_cubes=6,
        use_intention_map=True,
    )
    b, n_rect, n_corner = 8, 5, 3
    s = {}
    for name, code, dt in pallas_substep._MUT + pallas_substep._RO:
        if name == "rc":
            continue
        shp = pallas_substep._suffix_shape(code, params, n_rect, n_corner) + (b,)
        s[name] = jnp.zeros(shp, dt)
    rc = {
        f: jnp.zeros((params.num_robots, b), jnp.float32)
        for f in pallas_substep._RC_FIELDS
    }
    jaxpr = jax.make_jaxpr(
        lambda s, rc: pallas_substep._substep(params, rc, s)
    )(s, rc)
    # string scan catches ops nested inside sub-jaxprs (closed_call etc.)
    bad = [l for l in str(jaxpr).splitlines()
           if "= gather[" in l or "= scatter" in l]
    assert not bad, f"substep trace re-acquired gather/scatter ops: {bad[:3]}"


def test_kernel_supports_every_team():
    """Throwing support landed with the counter-hash RNG + analytic landing
    test; supports() must now accept every team so the TPU auto-dispatch
    engages the kernel for heterogeneous throwing configs too."""
    params = EnvParams.from_robot_config(
        [{"throwing_robot": 2}], env_name="large_empty",
        room_length=1.0, room_width=1.0, num_cubes=4,
    )
    assert pallas_substep.supports(params)


def test_throw_draws_distribution():
    """The hash RNG's normals must actually be N(mean, std) (the reference's
    np.random draw, envs.py:1306-1313) — moments over many counters."""
    from spatial_intention_maps_tpu import constants
    from spatial_intention_maps_tpu.envs import dynamics

    n = 4096
    fx, fy = dynamics.throw_draws(
        jnp.int32(12345),
        jnp.arange(n, dtype=jnp.int32),
        jnp.zeros(n, jnp.int32),
    )
    fx, fy = np.asarray(fx), np.asarray(fy)
    assert abs(fx.mean() - constants.THROW_FORCE_X_MEAN) < 0.05
    assert abs(fx.std() - constants.THROW_FORCE_X_STD) < 0.05
    # fy is sign-flipped with p=0.5: |fy| has the folded stats, mean ~ 0
    assert abs(fy.mean()) < 0.1
    assert abs(np.abs(fy).mean() - constants.THROW_FORCE_Y_MEAN) < 0.1
    # draws differ across robots at the same counter
    fx2, _ = dynamics.throw_draws(
        jnp.int32(12345), jnp.arange(n, dtype=jnp.int32), jnp.ones(n, jnp.int32)
    )
    assert not np.allclose(fx, np.asarray(fx2))
