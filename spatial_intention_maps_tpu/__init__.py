"""spatial_intention_maps_tpu — a TPU-native (JAX/XLA/Pallas) multi-agent
spatial-intention-maps framework.

A from-scratch re-design of the capabilities of
jimmyyhwu/spatial-intention-maps (ICRA 2021) for TPU hardware:

* the PyBullet physics + renderer stack is replaced by a pure-functional,
  fixed-shape, batched 2D kinematic simulator with analytic top-down
  segmentation rasterization and FOV-wedge visibility raycasting,
* the Cython SPFA shortest-path module is replaced by batched chamfer-sweep
  wavefront kernels producing distance images + on-device path backtrace,
* the per-robot PyTorch FCN DQN becomes a Flax ResNet-18(stride-4) FCN with
  Double-DQN training in one fused, jitted act->store->learn loop,
* the 8-process actor pool becomes a batch axis sharded over a
  ``jax.sharding.Mesh``.

Reference behaviors are cited as ``envs.py:<line>`` etc. into the upstream
repo throughout the codebase.
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache — the env step graph is large, so
    caching compiles across processes matters for tooling and tests."""
    import jax

    path = path or _os.environ.get(
        "SIM_TPU_COMPILATION_CACHE", _os.path.expanduser("~/.cache/sim_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


if _os.environ.get("SIM_TPU_DISABLE_COMPILATION_CACHE", "0") != "1":
    enable_compilation_cache()

from . import constants  # noqa: F401
