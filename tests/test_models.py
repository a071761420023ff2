"""Model parity / training-machinery tests."""

import jax
import jax.numpy as jnp
import numpy as np

from spatial_intention_maps_tpu.models import FCN
from spatial_intention_maps_tpu.models.fcn import upsample2x_align_corners
from spatial_intention_maps_tpu.replay import ReplayBuffer
from spatial_intention_maps_tpu.train import dqn


def test_upsample_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).rand(2, 12, 12, 3).astype(np.float32)
    got = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    exp = F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=True)
    exp = exp.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_fcn_shapes():
    model = FCN(num_output_channels=2)
    x = jnp.zeros((1, 96, 96, 4))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 96, 96, 2)
    # Parameter count matches ResNet18(stride-4)+FCN head:
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # Reference torch model has ~11.2M params for 4-in/2-out.
    assert 10_500_000 < n_params < 12_000_000, n_params


def test_replay_ring():
    buf = ReplayBuffer.create(8, 2, dtype=jnp.float32)
    s = jnp.arange(5, dtype=jnp.float32)[:, None, None, None] * jnp.ones((5, 96, 96, 2))
    a = jnp.arange(5, dtype=jnp.int32)
    r = jnp.arange(5, dtype=jnp.float32)
    mask = jnp.array([True, True, False, True, True])
    buf = buf.push(s, a, r, s, jnp.ones(5, bool), mask)
    assert int(buf.size) == 4
    assert int(buf.position) == 4
    # Stored rows are the masked-in ones, in order.
    np.testing.assert_array_equal(np.asarray(buf.actions[:4]), [0, 1, 3, 4])
    # Wrap-around
    buf = buf.push(s, a, r, s, jnp.ones(5, bool), jnp.ones(5, bool))
    assert int(buf.size) == 8
    assert int(buf.position) == 1
    batch = buf.sample(jax.random.PRNGKey(0), 6)
    assert batch["state"].shape == (6, 96, 96, 2)


def test_dqn_update_runs_and_learns():
    model = FCN(num_output_channels=1)
    x = jnp.zeros((1, 96, 96, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    opt = dqn.make_optimizer(0.01, 1e-4, 100)
    ts = dqn.create_train_state(model, variables, opt)

    key = jax.random.PRNGKey(1)
    batch = dict(
        state=jax.random.uniform(key, (4, 96, 96, 2)),
        action=jnp.array([0, 5, 100, 9215], jnp.int32),
        reward=jnp.array([1.0, 0.0, -1.0, 0.5]),
        next_state=jax.random.uniform(key, (4, 96, 96, 2)),
        # Terminal transitions only: fixed regression targets, so repeated
        # updates on the same batch must reduce the loss monotonically
        # (bootstrapped targets move with the online argmax and need not).
        has_next=jnp.array([False, False, False, False]),
    )
    update = jax.jit(
        lambda ts, b: dqn.dqn_update(model, opt, ts, b, 0.75, use_double_dqn=True)
    )
    ts1, info1 = update(ts, batch)
    assert np.isfinite(float(info1["loss"]))
    # Parameters changed
    p0 = jax.tree.leaves(ts.variables["params"])[0]
    p1 = jax.tree.leaves(ts1.variables["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # Loss decreases over repeated updates on the same fixed targets (SGD
    # momentum overshoots on a 5-step horizon; compare a settled tail).
    tsn, losses = ts1, []
    for _ in range(20):
        tsn, info_n = update(tsn, batch)
        losses.append(float(info_n["loss"]))
    assert np.mean(losses[-3:]) < float(info1["loss"]), (losses, info1["loss"])
    # Target sync copies params
    tsn = dqn.sync_target(tsn)
    t0 = jax.tree.leaves(tsn.target_variables["params"])[0]
    pn = jax.tree.leaves(tsn.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(t0), np.asarray(pn))


def test_intention_update_learns():
    """BCE intention training (train.py:143-158 parity): a tiny FCN learns to
    reproduce a synthetic intention channel from the other channels."""
    import jax
    import jax.numpy as jnp

    from spatial_intention_maps_tpu.models import FCN
    from spatial_intention_maps_tpu.train import dqn

    model = FCN(num_output_channels=2, layer_planes=(8, 8, 8, 8), head_planes=(8, 8))
    imodel = FCN(num_output_channels=1, layer_planes=(8, 8, 8, 8), head_planes=(8, 8))
    key = jax.random.PRNGKey(0)
    n_ch = 3
    variables = model.init(key, jnp.zeros((1, 96, 96, n_ch)), train=False)
    ivariables = imodel.init(key, jnp.zeros((1, 96, 96, n_ch - 1)), train=False)
    opt = dqn.make_optimizer(0.05, 1e-4, 100)
    iopt = dqn.make_optimizer(0.05, 1e-4, 100)
    ts = dqn.create_train_state(
        model, variables, opt,
        intention_model=imodel, intention_variables=ivariables,
        intention_optimizer=iopt,
    )

    # Ground-truth intention = thresholded copy of channel 0.  Use 8-px
    # block-structured inputs: the stride-4 FCN can't fit per-pixel noise,
    # but block targets are within its output resolution.
    k1, _ = jax.random.split(key)
    x = jax.random.uniform(k1, (8, 12, 12, n_ch - 1))
    x = jnp.repeat(jnp.repeat(x, 8, axis=1), 8, axis=2)
    gt = (x[..., :1] > 0.5).astype(jnp.float32)
    batch = {"state": jnp.concatenate([x, gt], axis=-1)}

    update = jax.jit(lambda ts, b: dqn.intention_update(imodel, iopt, ts, b))
    ts, info0 = update(ts, batch)
    losses = [float(info0["loss_intention"])]
    for _ in range(120):
        ts, info = update(ts, batch)
        losses.append(float(info["loss_intention"]))
    assert losses[-1] < losses[0] * 0.75, losses[::30]


def test_predicted_intention_act_train_and_eval_shapes():
    """Predicted-intention action selection must handle BOTH state layouts
    (reference policies.py:119-138): training states that carry the
    ground-truth intention as the last channel (strip + substitute), and
    eval states from an env without the intention map (append).  Round-3
    regression test: the eval path used to strip a REAL channel."""
    from spatial_intention_maps_tpu.envs.types import EnvParams
    from spatial_intention_maps_tpu.policies import DQNPolicy

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 1}], env_name="small_empty",
        room_length=1.0, room_width=0.5, num_cubes=2,
        use_intention_map=True, intention_map_encoding="ramp",
    )
    c = params.num_state_channels  # includes the GT intention channel
    policy = DQNPolicy(
        params, num_input_channels=c, use_predicted_intention=True,
        layer_planes=(8, 8, 8, 8), head_planes=(8, 8),
    )
    variables = policy.init(jax.random.PRNGKey(0))
    gids = jnp.zeros((2,), jnp.int32)
    key = jax.random.PRNGKey(1)

    # Train layout: C channels (with GT intention last).
    obs_train = jax.random.uniform(jax.random.PRNGKey(2), (2, 96, 96, c))
    a1, q1 = policy.act(variables, obs_train, gids, 0.0, key)
    # Eval layout: C-1 channels (env without intention map).
    obs_eval = obs_train[..., :-1]
    a2, q2 = policy.act(variables, obs_eval, gids, 0.0, key)

    # Identical underlying state => identical predictions => same actions.
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)
    space = 2 * 96 * 96
    assert np.all((np.asarray(a1) >= 0) & (np.asarray(a1) < space))
