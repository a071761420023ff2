"""SimEnv.set_poses (the GUI pose editor backend) and print-asset
generators (aruco/printouts parity)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_set_poses_teleports_and_reobserves(sim_env_factory=None):
    from spatial_intention_maps_tpu.envs.types import EnvParams
    from spatial_intention_maps_tpu.envs.vector_env import SimEnv

    params = EnvParams.from_robot_config(
        [{"lifting_robot": 2}],
        env_name="small_empty",
        room_length=1.0,
        room_width=0.5,
        num_cubes=3,
        num_pass_pairs=2,
    )
    env = SimEnv(params, seed=0)
    env.reset()

    rp = np.asarray(env.state.robot_pos).copy()
    rp[0] = (0.30, 0.10)
    rh = np.asarray(env.state.robot_heading).copy()
    rh[0] = np.pi / 2
    state = env.set_poses(robot_pos=rp, robot_heading=rh)

    assert np.allclose(np.asarray(env.state.robot_pos)[0], (0.30, 0.10))
    # Servo target moves with the body (no snap-back).
    assert np.allclose(np.asarray(env.state.target_pos)[0], (0.30, 0.10))
    assert np.isclose(float(env.state.robot_heading[0]), np.pi / 2)
    # Still produces a valid nested observation for the awaiting robot.
    flat = [o for g in state for o in g if o is not None]
    assert len(flat) == 1 and flat[0].shape[-1] == params.num_state_channels

    cp = np.asarray(env.state.cube_pos).copy()
    cp[0, :2] = (-0.3, -0.15)
    env.set_poses(cube_pos=cp[:, :2])
    assert np.allclose(np.asarray(env.state.cube_pos)[0, :2], (-0.3, -0.15))


def test_print_asset_generators(tmp_path):
    from spatial_intention_maps_tpu.real import markers

    rng = np.random.default_rng(0)
    sheet = markers.generate_marker_sheets(
        tmp_path / "sheets.pdf",
        bitmap_fn=lambda mid: rng.integers(0, 2, (6, 6)).astype(np.uint8),
    )
    recep = markers.generate_receptacle_target(tmp_path / "receptacle.pdf")
    covers = markers.generate_back_covers(tmp_path / "covers.pdf")
    for p in (sheet, recep, covers):
        assert Path(p).stat().st_size > 500
