"""Experiment configuration system.

Mirrors the reference's flat YAML key space (config/templates/
lifting_1-small_empty.yml) and run lifecycle (utils.py:18-90): YAML <->
attribute dicts, ``setup_run`` stamping a timestamped run directory with a
frozen resolved config, and strict env-kwarg derivation.  Configs written by
the reference repo load unchanged.
"""

import datetime
from pathlib import Path

from . import constants
from .utils.config_dict import ConfigDict

# Keys consumed by the simulator (the VectorEnv.__init__ kwarg surface,
# envs.py:37-53, minus debug/real-robot-only kwargs; utils.py:182-207).
ENV_KEYS = [
    "robot_config", "room_length", "room_width", "num_cubes", "env_name",
    "use_robot_map", "use_distance_to_receptacle_map",
    "distance_to_receptacle_map_scale", "use_shortest_path_to_receptacle_map",
    "use_shortest_path_map", "shortest_path_map_scale",
    "use_intention_map", "intention_map_encoding", "intention_map_scale",
    "intention_map_line_thickness", "use_history_map",
    "use_intention_channels", "intention_channel_encoding",
    "intention_channel_nonspatial_scale",
    "use_shortest_path_partial_rewards", "success_reward",
    "partial_rewards_scale", "lifting_pointless_drop_penalty",
    "obstacle_collision_penalty", "robot_collision_penalty",
    "use_shortest_path_movement", "use_partial_observations",
    "inactivity_cutoff_per_robot", "random_seed",
    "show_gui", "use_egl_renderer",
]

# Env kwargs that may legitimately be missing from old configs
# (utils.py:196 allows these three to fall back to defaults).
OPTIONAL_ENV_KEYS = {"use_robot_map", "intention_map_scale", "intention_map_line_thickness"}

ENV_DEFAULTS = {
    "robot_config": [{"lifting_robot": 1}],
    "room_length": 1.0,
    "room_width": 0.5,
    "num_cubes": 10,
    "env_name": "small_empty",
    "use_robot_map": True,
    "use_distance_to_receptacle_map": False,
    "distance_to_receptacle_map_scale": 0.25,
    "use_shortest_path_to_receptacle_map": True,
    "use_shortest_path_map": True,
    "shortest_path_map_scale": 0.25,
    "use_intention_map": False,
    "intention_map_encoding": "ramp",
    "intention_map_scale": 1.0,
    "intention_map_line_thickness": 2,
    "use_history_map": False,
    "use_intention_channels": False,
    "intention_channel_encoding": "spatial",
    "intention_channel_nonspatial_scale": 0.025,
    "use_shortest_path_partial_rewards": True,
    "success_reward": constants.DEFAULT_SUCCESS_REWARD,
    "partial_rewards_scale": constants.DEFAULT_PARTIAL_REWARDS_SCALE,
    "lifting_pointless_drop_penalty": constants.DEFAULT_POINTLESS_DROP_PENALTY,
    "obstacle_collision_penalty": constants.DEFAULT_OBSTACLE_COLLISION_PENALTY,
    "robot_collision_penalty": constants.DEFAULT_ROBOT_COLLISION_PENALTY,
    "use_shortest_path_movement": True,
    "use_partial_observations": True,
    "inactivity_cutoff_per_robot": 100,
    "random_seed": None,
    "show_gui": False,
    "use_egl_renderer": False,
}

# Training keys (template lines under "Learning"/"DQN") + TPU-specific keys.
TRAIN_DEFAULTS = {
    "batch_size": 32,
    "learning_rate": 0.01,
    "weight_decay": 0.0001,
    "grad_norm_clipping": 100,
    "num_input_channels": 4,
    "checkpoint_freq": 1000,
    "use_predicted_intention": False,
    "use_predicted_intention_frac": 0.9,
    "total_timesteps": 40000,
    "exploration_frac": 0.1,
    "replay_buffer_size": 10000,
    "use_double_dqn": True,
    "discount_factors": [0.75],
    "final_exploration": 0.01,
    "learning_starts_frac": 0.025,
    "train_freq": 1,
    "target_update_freq": 1000,
    # TPU-native additions (absent from reference configs; defaulted).
    "num_parallel_envs": 32,
    "substeps_per_round": 64,
    "service_fraction": 0.25,
    "mesh_shape": None,            # e.g. [8] -> 8-way data parallel
    "obs_dtype": "bfloat16",
    "compute_dtype": "bfloat16",
}

META_DEFAULTS = {
    "experiment_name": "unnamed",
    "run_name": None,
    "logs_dir": None,
    "checkpoints_dir": None,
    "log_dir": None,
    "checkpoint_dir": None,
    "policy_path": None,
    "checkpoint_path": None,
}


def default_config() -> ConfigDict:
    cfg = ConfigDict()
    cfg.update(META_DEFAULTS)
    cfg.update(TRAIN_DEFAULTS)
    cfg.update(ENV_DEFAULTS)
    return ConfigDict.from_nested(cfg)


def load_config(config_path) -> ConfigDict:
    with open(config_path, "r") as f:
        return ConfigDict.from_yaml(f)


def save_config(config_path, cfg: ConfigDict):
    with open(config_path, "w") as f:
        f.write(ConfigDict.from_nested(cfg).to_yaml())


def get_logs_dir() -> Path:
    return Path("logs")


def get_checkpoints_dir() -> Path:
    return Path("checkpoints")


def get_eval_dir() -> Path:
    return Path("eval")


def setup_run(config_path):
    """Stamp run_name/log_dir/checkpoint_dir and freeze the config
    (utils.py:36-59)."""
    cfg = load_config(config_path)
    if cfg.get("log_dir") is not None:
        return config_path  # Run has already been set up

    logs_dir = get_logs_dir() if cfg.get("logs_dir") is None else Path(cfg.logs_dir)
    checkpoints_dir = (
        get_checkpoints_dir() if cfg.get("checkpoints_dir") is None else Path(cfg.checkpoints_dir)
    )
    timestamp = datetime.datetime.now().strftime("%Y%m%dT%H%M%S%f")
    cfg.run_name = "{}-{}".format(timestamp, cfg.experiment_name)
    log_dir = logs_dir / cfg.run_name
    log_dir.mkdir(parents=True, exist_ok=True)
    cfg.log_dir = str(log_dir)
    cfg.checkpoint_dir = str(checkpoints_dir / cfg.run_name)

    out_path = log_dir / "config.yml"
    save_config(out_path, cfg)
    return out_path


def select_run(logs_dir=None):
    """Interactive run picker (utils.py:61-90 parity): on a TTY, list runs
    newest-first and prompt for a choice (Enter = most recent); otherwise —
    scripts, CI, nohup — fall back to the most recent run."""
    import sys

    logs_dir = get_logs_dir() if logs_dir is None else Path(logs_dir)
    if not logs_dir.exists():
        return None
    log_dirs = sorted(x for x in logs_dir.iterdir() if x.is_dir())
    if not log_dirs:
        return None
    if len(log_dirs) > 1 and sys.stdin.isatty() and sys.stdout.isatty():
        newest_first = list(reversed(log_dirs))
        for i, d in enumerate(newest_first):
            print(f"  [{i}] {d.name}")
        try:
            choice = input(f"select run [0-{len(newest_first) - 1}] (default 0): ")
            idx = int(choice) if choice.strip() else 0
            if 0 <= idx < len(newest_first):
                return newest_first[idx] / "config.yml"
        except (ValueError, EOFError, KeyboardInterrupt):
            pass
        print("using most recent run")
    return log_dirs[-1] / "config.yml"


def apply_misc_env_modifications(cfg, env_name):
    """Room-size / rescue adjustments (utils.py:166-180)."""
    if env_name.startswith("large"):
        cfg["room_length"] = 1.0
        cfg["room_width"] = 1.0
        cfg["num_cubes"] = 20
    else:
        cfg["room_length"] = 1.0
        cfg["room_width"] = 0.5
        cfg["num_cubes"] = 10
    if any("rescue_robot" in g for g in cfg["robot_config"]):
        cfg["use_distance_to_receptacle_map"] = False
        cfg["use_shortest_path_to_receptacle_map"] = False


def env_kwargs_from_cfg(cfg, **overrides):
    """Strict kwarg derivation (utils.py:182-207): every env key must exist in
    the config unless it is one of the historically-optional keys."""
    kwargs = {}
    for key in ENV_KEYS:
        if key in cfg:
            kwargs[key] = cfg[key]
        elif key in OPTIONAL_ENV_KEYS:
            kwargs[key] = ENV_DEFAULTS[key]
        else:
            raise KeyError("env kwarg {} not found in config".format(key))
    kwargs.update(overrides)
    return kwargs


def num_robots_from_robot_config(robot_config):
    return sum(sum(g.values()) for g in robot_config)


def robot_group_types(robot_config):
    return [next(iter(g.keys())) for g in robot_config]
