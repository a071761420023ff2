"""Fully-convolutional Q-network head (networks.py:6-26).

ResNet-18(stride-4) features -> 1x1 conv 512->128 + BN + ReLU -> 2x bilinear
upsample (align_corners=True) -> 1x1 conv 128->32 + BN + ReLU -> 2x upsample
-> 1x1 conv 32->C_out, producing a full-resolution Q-map.

The align-corners bilinear 2x upsample is expressed as two static
interpolation matmuls (MXU-friendly) for exact parity with
``F.interpolate(..., align_corners=True)``.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .resnet import ResNet18Features

# The reference's FCN head (networks.py:16-26) keeps torch's DEFAULT Conv2d
# init — kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in,
# uniform) — NOT the resnet loop's Kaiming fan_out (resnet.py:70-72, which
# only touches backbone modules).  Getting this wrong explodes the initial
# Q scale: fan_out of the last 1x1 conv is C_out (= 1-2), so fan_out init
# yields ~unit-variance weights on 32 inputs and |Q| in the hundreds at
# init, wasting the first ~1k updates fighting the blow-up down.
head_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _align_corners_matrix(n_in: int, scale: int = 2) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix with align_corners=True."""
    n_out = n_in * scale
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        c = i * (n_in - 1) / (n_out - 1)
        lo = int(np.floor(c))
        hi = min(lo + 1, n_in - 1)
        t = c - lo
        w[i, lo] += 1.0 - t
        w[i, hi] += t
    return w


def upsample2x_align_corners(x):
    """x: (B, H, W, C) -> (B, 2H, 2W, C)."""
    h, w = x.shape[1], x.shape[2]
    wh = jnp.asarray(_align_corners_matrix(h), x.dtype)
    ww = jnp.asarray(_align_corners_matrix(w), x.dtype)
    # HIGHEST precision: these are tiny interpolation matmuls and must stay
    # exact on TPU (default matmul precision is bf16).
    x = jnp.einsum("ih,bhwc->biwc", wh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("jw,biwc->bijc", ww, x, precision=jax.lax.Precision.HIGHEST)
    return x


class FCN(nn.Module):
    num_output_channels: int = 1
    dtype: Any = jnp.float32
    # Reference widths (networks.py:10-14); reducible for tiny test configs.
    layer_planes: tuple = (64, 128, 256, 512)
    head_planes: tuple = (128, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, 96, 96, C_in) -> (B, 96, 96, C_out) Q-map (NHWC)."""
        x = ResNet18Features(dtype=self.dtype, layer_planes=self.layer_planes)(x, train)
        x = nn.Conv(self.head_planes[0], (1, 1), kernel_init=head_init, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = upsample2x_align_corners(x)
        x = nn.Conv(self.head_planes[1], (1, 1), kernel_init=head_init, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = upsample2x_align_corners(x)
        # The Q head runs in float32 even when the trunk is bfloat16: bf16
        # Q-values (8 mantissa bits) tie across flat map regions, biasing the
        # greedy argmax to the lowest flat index (top-left) early in training.
        x = nn.Conv(self.num_output_channels, (1, 1), kernel_init=head_init,
                    dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return x
