"""TPU smoke test for the lane-major Pallas substep kernel.

Compiles ops/pallas_substep.run_substeps_pallas on the real chip (Mosaic,
not interpret mode), drives a mid-action batch through both engines, and
compares the full mutable state.  The CPU-mesh equivalence tests
(tests/test_pallas_substep.py) prove the math; this proves the Mosaic
lowering.  Exits 0 on match, 1 on mismatch/compile failure.
"""

import os
import sys

import jax
import numpy as np

from spatial_intention_maps_tpu.envs import env as env_core
from spatial_intention_maps_tpu.envs.types import EnvParams
from spatial_intention_maps_tpu.ops import pallas_substep
from spatial_intention_maps_tpu.train.fused import FusedLoop


def main():
    b = int(os.environ.get("SMOKE_NUM_ENVS", "128"))
    if os.environ.get("SMOKE_TEAM") == "throwing":
        # exercises the ballistic/throw kernel branches (counter-hash RNG,
        # analytic landing test) on real Mosaic
        params = EnvParams.from_robot_config(
            [{"lifting_robot": 2}, {"throwing_robot": 2}],
            env_name="large_empty",
            room_length=1.0, room_width=1.0, num_cubes=10,
            use_intention_map=True, intention_map_encoding="ramp",
        )
    else:
        params = EnvParams.from_robot_config(
            [{"lifting_robot": 4}], env_name="small_divider",
            room_length=1.0, room_width=0.5, num_cubes=10,
            use_intention_map=True, intention_map_encoding="ramp",
        )
    loop = FusedLoop(
        params, num_envs=b, num_channels=params.num_state_channels,
        substeps_per_round=64, service_capacity=min(b, 64),
        use_pallas_substep=False,
    )
    ls = loop.init(jax.random.PRNGKey(0))
    for _ in range(3):
        ls, _, _ = loop.round(ls, None, 1.0, False)
    env = ls.env

    n = 64
    ref = jax.jit(
        jax.vmap(lambda s: env_core.run_substeps(params, s, n, refresh=False))
    )(env)
    out = pallas_substep.run_substeps_pallas(params, env, n, interpret=False)
    jax.block_until_ready(out.robot_pos)

    bad = []
    for name, *_ in pallas_substep._MUT:
        a = np.asarray(getattr(ref, name))
        o = np.asarray(getattr(out, name))
        if a.dtype == np.bool_ or np.issubdtype(a.dtype, np.integer):
            ok = np.array_equal(a, o)
        else:
            ok = np.allclose(a, o, rtol=0, atol=1e-5)
        if not ok:
            bad.append(name)
    if bad:
        print("PALLAS SUBSTEP SMOKE: MISMATCH in", bad)
        sys.exit(1)
    print("PALLAS SUBSTEP SMOKE: OK (compiled + matched on",
          jax.devices()[0].platform, ")")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # compile failures must not kill the chain
        print("PALLAS SUBSTEP SMOKE: FAILED:", repr(e)[:2000])
        os._exit(1)
    os._exit(0)
