"""Fast Mosaic compile probe for the substep kernel.

Bypasses FusedLoop: builds zero-filled dummy inputs directly from the
kernel's declared shapes and asks the TPU backend to compile.  Prints the
FULL Mosaic diagnostic (the smoke tool's one-line print truncates it).

Usage: python tools_probe_substep_compile.py [team]  (team: lifting|throwing)
"""

import sys

import jax
import jax.numpy as jnp

from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.envs import geometry
from spatial_intention_maps_tpu.ops import pallas_substep as ps


def _layout_shapes(params):
    return geometry.layout_shapes(params.env_name, params.has_receptacle)


def main():
    team = sys.argv[1] if len(sys.argv) > 1 else "lifting"
    if team == "throwing":
        params = EnvParams.from_robot_config(
            [{"lifting_robot": 2}, {"throwing_robot": 2}],
            env_name="large_empty", room_length=1.0, room_width=1.0,
            num_cubes=10, use_intention_map=True,
        )
    else:
        params = EnvParams.from_robot_config(
            [{"lifting_robot": 4}], env_name="small_divider",
            room_length=1.0, room_width=0.5, num_cubes=10,
            use_intention_map=True,
        )
    n_rect, n_corner = _layout_shapes(params)
    b = 128
    arrays = []
    for nm, code, dt in ps._MUT + ps._RO:
        suf = ps._suffix_shape(code, params, n_rect, n_corner)
        arrays.append(jnp.zeros(suf + (b,), dt))
    try:
        lowered = ps._run.lower(params, b, 64, False, 128, *arrays)
        lowered.compile()
        print("COMPILE OK")
        return 0
    except Exception as e:  # noqa: BLE001
        print("COMPILE FAILED:")
        print(str(e))
        return 1


if __name__ == "__main__":
    sys.exit(main())
