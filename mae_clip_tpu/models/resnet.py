"""ResNet50 image tower, weight-compatible with timm/torchvision layouts.

The reference's default image tower is ``timm.create_model('resnet50',
num_classes=0, global_pool='avg')`` (reference: modules.py:17-19), i.e. the
standard torchvision ResNet-50 trunk with global average pooling emitting a
2048-d feature. This is a functional twin in NHWC with flax BatchNorm:

* conv kernels are HWIO (the importer transposes torch's OIHW);
* BatchNorm eps=1e-5, momentum matches torch's 0.1 (flax momentum=0.9),
  normalization math is identical; torch updates running_var with the
  UNBIASED batch variance while flax uses biased — normalization outputs
  match exactly in both train and eval; imported running stats drop in
  unchanged;
* max-pool pads with -inf exactly like torch's padded max_pool2d.

Module names mirror torch children (conv1/bn1/layer{1-4}/blocks) so the
checkpoint importer is a mechanical rename.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    width: int                    # bottleneck width (64/128/256/512)
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda feats, ks, st, name: nn.Conv(
            feats, (ks, ks), strides=(st, st), padding=[(ks // 2, ks // 2)] * 2,
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        shortcut = x
        y = nn.relu(bn("bn1")(conv(self.width, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.width, 3, self.stride, "conv2")(y)))
        y = bn("bn3")(conv(self.width * self.expansion, 1, 1, "conv3")(y))
        if self.downsample:
            shortcut = conv(self.width * self.expansion, 1, self.stride,
                            "downsample_conv")(x)
            shortcut = bn("downsample_bn")(shortcut)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    """Head-less ResNet trunk with global average pooling."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(images)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        for stage, (size, width) in enumerate(zip(self.stage_sizes,
                                                  self.widths), start=1):
            for block in range(size):
                stride = 2 if (stage > 1 and block == 0) else 1
                x = Bottleneck(width=width, stride=stride,
                               downsample=(block == 0), dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"layer{stage}_{block}")(x, train)
        return jnp.mean(x, axis=(1, 2))   # global avg pool -> (B, 2048)


def resnet50(dtype: Optional[Any] = None,
             param_dtype: Any = jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), widths=(64, 128, 256, 512),
                  dtype=dtype, param_dtype=param_dtype)
