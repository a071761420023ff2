"""Config -> env-params / policy / trainer factories (utils.py:159-207
equivalents)."""

import jax.numpy as jnp

from . import config as config_mod
from .envs.types import EnvParams
from .envs.vector_env import BatchedEnv, SimEnv
from .policies import DQNPolicy


def env_params_from_cfg(cfg, **overrides) -> EnvParams:
    kwargs = config_mod.env_kwargs_from_cfg(cfg, **overrides)
    robot_config = kwargs.pop("robot_config")
    # Drop host-side-only kwargs.
    for k in ("random_seed", "show_gui", "use_egl_renderer"):
        kwargs.pop(k, None)
    return EnvParams.from_robot_config(robot_config, **kwargs)


def get_env_from_cfg(cfg, num_envs=None, real=False, real_robot_indices=None,
                     real_cube_indices=None, real_env_kwargs=None, **overrides):
    """Batched env if num_envs given, the physical-robot RealEnv when
    ``real=True`` (reference utils.py:183-201), else the reference-shaped
    SimEnv."""
    params = env_params_from_cfg(cfg, **overrides)
    if real:
        from .real.real_env import RealEnv

        return RealEnv(
            params, real_robot_indices, real_cube_indices,
            **(real_env_kwargs or {}),
        )
    if num_envs is not None:
        return BatchedEnv(params, num_envs)
    return SimEnv(params, seed=cfg.get("random_seed"))


def get_policy_from_cfg(cfg, **overrides) -> DQNPolicy:
    params = env_params_from_cfg(cfg)
    return DQNPolicy(
        params,
        num_input_channels=cfg.num_input_channels,
        use_predicted_intention=cfg.get("use_predicted_intention", False),
        compute_dtype=jnp.bfloat16
        if cfg.get("compute_dtype", "bfloat16") == "bfloat16"
        else jnp.float32,
        **overrides,
    )
