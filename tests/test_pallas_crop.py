"""Fused Pallas egocentric crop vs the one-hot-matmul XLA path.

The kernel must pick the SAME nearest-neighbour cells with the same bf16
value rounding as raster_ops.extract_local_maps_mxu (which build_state uses
on non-TPU backends), for both room sizes and under vmap — CPU runs use the
Pallas interpreter; on a TPU backend the same tests exercise Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatial_intention_maps_tpu.ops import pallas_crop, raster_ops

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("variant", ["reduce", "matvec"])
@pytest.mark.parametrize("hw", [(80, 128), (128, 128)])
def test_crop_matches_mxu_path(hw, variant):
    h, w = hw
    c = 5
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.rand(h, w, c).astype(np.float32) * 3.0)
    pos = jnp.asarray([0.21, -0.13], jnp.float32)
    heading = jnp.asarray(2.1, jnp.float32)
    ref = raster_ops.extract_local_maps_mxu(g, pos, heading)
    out = pallas_crop.extract_local_maps_pallas(
        g, pos, heading, interpret=INTERPRET, variant=variant
    )
    assert out.shape == ref.shape == (96, 96, c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_crop_vmapped_batch():
    h, w, c = 80, 128, 4
    m = 3
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.rand(m, h, w, c).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-0.3, 0.3, (m, 2)).astype(np.float32))
    heading = jnp.asarray(rng.uniform(-3, 3, m).astype(np.float32))
    out = jax.vmap(
        lambda gg, pp, hh: pallas_crop.extract_local_maps_pallas(
            gg, pp, hh, interpret=INTERPRET
        )
    )(g, pos, heading)
    ref = jax.vmap(raster_ops.extract_local_maps_mxu)(g, pos, heading)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_crop_heading_rotates_cells():
    """Crops at different headings must read different cells (sanity that
    the affine index math went through the kernel, not just a center crop)."""
    h, w, c = 80, 128, 1
    g = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w, 1)
    pos = jnp.zeros(2, jnp.float32)
    a = pallas_crop.extract_local_maps_pallas(
        g, pos, jnp.float32(0.0), interpret=INTERPRET
    )
    b = pallas_crop.extract_local_maps_pallas(
        g, pos, jnp.float32(1.0), interpret=INTERPRET
    )
    assert not np.allclose(np.asarray(a), np.asarray(b))
