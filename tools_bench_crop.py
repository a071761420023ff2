"""Crop-kernel timing forensics.

The round profiler measured the pallas matvec crop at ~14 ms (B=1024,
M=256) while a standalone ones-input microbench clocked 0.06 ms — either
XLA folds something through the constant stack, or the profiler context
inflates the number.  Time the kernel on random vs ones stacks, at several
block sizes (block 9216 OOMs scoped vmem: output staging is whole-tensor
under vmap), and the XLA one-hot path for reference.

Usage: python tools_bench_crop.py [M] [C]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=10):
    """Data-dependence-chained timing with ONE host sync: through the
    remote tunnel, block_until_ready on an unconsumed output has been
    observed to return early (3 us 'timings' for 22 ms kernels), so each
    rep's scalar reduction feeds the next rep's accumulator and the final
    float() forces the whole chain; a null-jit RTT baseline is subtracted."""
    red = jax.jit(lambda acc, *a: acc + jax.tree.reduce(
        lambda r, x: r + jnp.sum(x.astype(jnp.float32)),
        fn(*a), jnp.float32(0)))
    null = jax.jit(lambda acc: acc + 1.0)
    acc = red(jnp.float32(0), *args)
    float(acc)  # compile + settle
    a0 = null(jnp.float32(0))
    t0 = time.time()
    for _ in range(reps):
        a0 = null(a0)
    rtt = time.time() - t0
    acc = jnp.float32(0)
    t0 = time.time()
    for _ in range(reps):
        acc = red(acc, *args)
    s = float(acc)
    ms = (time.time() - t0 - rtt) / reps * 1000
    print(f"{name:42s} {ms:8.2f} ms   (sum {s:.1f})", flush=True)
    return None


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = 80, 128

    from spatial_intention_maps_tpu.ops import pallas_crop, raster_ops

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    stacks_r = jax.random.uniform(k1, (m, h, w, c))
    stacks_1 = jnp.ones((m, h, w, c), jnp.float32)
    pos = jax.random.uniform(k2, (m, 2), minval=-0.3, maxval=0.3)
    head = jax.random.uniform(k3, (m,), minval=-3.1, maxval=3.1)

    timeit("crop XLA one-hot (rand)", jax.jit(jax.vmap(
        raster_ops.extract_local_maps_mxu)), stacks_r, pos, head)

    for label, stacks in (("rand", stacks_r), ("ones", stacks_1)):
        for block in (1024, 2304, 4608):
            os.environ["SIM_TPU_PALLAS_CROP_BLOCK"] = str(block)
            fn = jax.jit(jax.vmap(
                lambda g, p, hh: pallas_crop.extract_local_maps_pallas(g, p, hh)
            ))
            try:
                timeit(f"crop pallas matvec ({label}) block={block}",
                       fn, stacks, pos, head)
            except Exception as e:
                print(f"crop pallas matvec ({label}) block={block}: "
                      f"{type(e).__name__}", flush=True)


def bench_scatter(m=256, p=5120):
    """scatter_max vs the sorted-dedup variant on polyline-like inputs."""
    import numpy as np

    from spatial_intention_maps_tpu.ops import raster_ops

    h, w = 80, 128
    rng = np.random.RandomState(0)
    img = jnp.zeros((m, h, w), jnp.float32)
    centers = rng.randint(0, h * w, (m, 40))
    base = np.repeat(centers, p // 40, axis=1)
    ii = jnp.asarray(np.clip(base // w + rng.randint(-2, 3, (m, p)), 0, h - 1))
    jj = jnp.asarray(np.clip(base % w + rng.randint(-2, 3, (m, p)), 0, w - 1))
    vals = jnp.asarray(rng.rand(m, p).astype(np.float32))
    valid = jnp.asarray(rng.rand(m, p) > 0.4)

    plain = timeit("scatter_max (vmapped M)", jax.jit(jax.vmap(
        raster_ops.scatter_max)), img, ii, jj, vals, valid)
    for budget in (1024, 2048):
        out = timeit(f"scatter_max_dedup budget={budget}", jax.jit(jax.vmap(
            lambda g, a, b, v, ok, bd=budget: raster_ops.scatter_max_dedup(
                g, a, b, v, ok, budget=bd)
        )), img, ii, jj, vals, valid)
        print(f"  match: {bool(jnp.all(out == plain))}", flush=True)


if __name__ == "__main__":
    main()
    bench_scatter()
    os._exit(0)
