"""ResNet-18 feature backbone with output stride 4.

Re-implements the reference's modified torchvision ResNet-18 (resnet.py:19-120)
in Flax: the strides of layers 2-4 are removed (resnet.py:61-66), so a 96x96
input yields 24x24x512 features.  BatchNorm with running statistics, Kaiming
(He) normal conv init, BN weight=1 / bias=0 (resnet.py:70-75).

TPU notes: convolutions run in NHWC (XLA's native TPU layout) and the compute
dtype is configurable (bfloat16 by default in training) while parameters and
batch statistics stay float32.
"""

from functools import partial
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

# He-normal fan-out matches torch's kaiming_normal_(mode='fan_out',
# nonlinearity='relu') (resnet.py:70-72).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        conv = partial(
            nn.Conv,
            use_bias=False,
            kernel_init=conv_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        identity = x
        out = conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1)(x)
        out = norm()(out)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3), padding=1)(out)
        out = norm()(out)
        if self.downsample:
            identity = conv(self.planes, (1, 1), strides=(self.stride, self.stride))(x)
            identity = norm()(identity)
        return nn.relu(out + identity)


class ResNet18Features(nn.Module):
    """ResNet.features: conv1 (stride 2) -> maxpool (stride 2) -> 4 layer
    groups of 2 BasicBlocks, all at stride 1 (resnet.py:96-107)."""

    dtype: Any = jnp.float32
    layer_planes: Sequence[int] = (64, 128, 256, 512)
    blocks_per_layer: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_planes = 64
        for planes in self.layer_planes:
            for b in range(self.blocks_per_layer):
                downsample = b == 0 and in_planes != planes
                x = BasicBlock(planes, stride=1, downsample=downsample, dtype=self.dtype)(
                    x, train
                )
            in_planes = planes
        return x
