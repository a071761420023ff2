"""Shortest-path micro-benchmark (shortest_paths/demo.py parity).

Benchmarks the three path APIs (waypoint path, point distance, full distance
image) across the available engines: the C++ SPFA library, the lax wavefront
sweep, and the Pallas streaming kernel (TPU only).  Also asserts that all
engines agree on a golden grid, mirroring demo.py:44-48.
"""

import time

import numpy as np

from spatial_intention_maps_tpu.native import GridGraph
from spatial_intention_maps_tpu.ops import wavefront


def golden_grid():
    """A small_divider-like configuration space."""
    h, w = 184, 232
    free = np.zeros((h, w), bool)
    free[70:114, 22:210] = True         # room interior
    free[76:108, 112:120] = False       # divider with two openings
    free[76:84, 112:120] = True
    free[100:108, 112:120] = True
    return free


def bench(fn, n=10, name=""):
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    dt = (time.time() - t0) / n * 1000
    print(f"  {name}: {dt:.2f} ms")
    return dt


def main():
    free = golden_grid()
    src, tgt = (90, 40), (90, 200)

    print("C++ SPFA (native/spfa):")
    g = GridGraph(free.astype(np.uint8))
    bench(lambda: GridGraph(free.astype(np.uint8)).shortest_path(src, tgt),
          name="shortest_path (incl. graph build)")
    bench(lambda: g.shortest_path_distance(src, tgt), name="shortest_path_distance")
    bench(lambda: GridGraph(free.astype(np.uint8)).shortest_path_image(src),
          name="shortest_path_image")
    ref_img = g.shortest_path_image(src)
    ref_d = g.shortest_path_distance(src, tgt)

    import jax
    import jax.numpy as jnp

    print(f"JAX backend: {jax.default_backend()}")
    freej = jnp.asarray(free)

    print("lax wavefront sweep:")
    img_fn = jax.jit(lambda f: wavefront.distance_image(f, src[0], src[1], 3))
    img = np.asarray(img_fn(freej))
    bench(lambda: jax.block_until_ready(img_fn(freej)), name="distance image")
    reach = ref_img >= 0
    err = np.abs(img[reach] - ref_img[reach]).max()
    print(f"  max |err| vs SPFA: {err:.5f}")
    assert err < 1e-2

    if wavefront._use_pallas():
        print("Pallas streaming kernel (batch 512):")
        b = 512
        freeb = jnp.tile(freej[None], (b, 1, 1))
        dist0 = jnp.full((b,) + free.shape, 1e9, jnp.float32).at[:, src[0], src[1]].set(0.0)
        pay0 = jnp.zeros((b,) + free.shape, jnp.int32)
        pal = jax.jit(lambda d, p, f: wavefront.sweep_batched(d, p, f, 3))
        out = np.asarray(pal(dist0, pay0, freeb)[0])
        dt = bench(lambda: jax.block_until_ready(pal(dist0, pay0, freeb)), name="512 distance images")
        print(f"  => {dt / b:.4f} ms per image")
        err = np.abs(out[0][reach] - ref_img[reach]).max()
        print(f"  max |err| vs SPFA: {err:.5f}")
        assert err < 1e-2

    print("all engines agree")


if __name__ == "__main__":
    main()
    import os

    os._exit(0)
