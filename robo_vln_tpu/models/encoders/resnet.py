"""ResNet visual encoders (flax, NHWC, bf16-friendly).

Two families, matching the reference's two frozen backbones:

* :class:`GNResNetEncoder` — DDPPO-style GroupNorm ResNet50 used for depth
  (reference resnet_encoders.py:13-108 wrapping
  habitat_baselines.rl.ddppo.policy.resnet: baseplanes=32, ngroups=16,
  Bottleneck [3,4,6,3], channel run 32->64->128->256 with expansion 4, then a
  3x3 "compression" conv to ~2048 flat features);
* :class:`TVResNet50` — torchvision-layout ResNet50 with frozen
  (eval-mode) BatchNorm used for RGB (reference resnet_encoders.py:111-237).
  BatchNorm-eval is a per-channel affine from running stats, stored as frozen
  variables so ImageNet weights port 1:1.

TPU notes: NHWC layout throughout (TPU-native), convs run in the configured
compute dtype with fp32 params; frozen backbones are wrapped in
``stop_gradient`` by the policies, and XLA constant-folds the BN affine into
the convs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.adaptive_avg_pool2d semantics on NHWC, as two small matmuls
    (bin start=floor(i*In/Out), end=ceil((i+1)*In/Out))."""
    H, W = x.shape[1], x.shape[2]
    oh, ow = out_hw

    def pool_matrix(inp: int, out: int) -> np.ndarray:
        m = np.zeros((out, inp), np.float32)
        for i in range(out):
            s = (i * inp) // out
            e = -(-((i + 1) * inp) // out)
            m[i, s:e] = 1.0 / (e - s)
        return m

    ph = jnp.asarray(pool_matrix(H, oh))
    pw = jnp.asarray(pool_matrix(W, ow))
    x = jnp.einsum("oh,bhwc->bowc", ph, x)
    x = jnp.einsum("pw,bowc->bopc", pw, x)
    return x


class FrozenBatchNorm(nn.Module):
    """BatchNorm permanently in eval mode: y = (x-mean)/sqrt(var+eps)*w + b.

    Stats and affine live in the ``batch_stats``/``params`` collections so a
    torchvision state_dict ports directly; the whole op is a constant affine
    XLA folds into the preceding conv.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        ).value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.compute_dtype,
            name="conv",
        )(x)


class GNBottleneck(nn.Module):
    """GroupNorm bottleneck block (habitat ddppo resnet.Bottleneck layout:
    1x1 -> gn -> relu -> 3x3(stride) -> gn -> relu -> 1x1 -> gn, residual)."""

    planes: int
    ngroups: int
    stride: int = 1
    expansion: int = 4
    compute_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32  # GN output dtype; stats always f32 (flax)

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _Conv(self.planes, 1, 1, self.compute_dtype, name="conv1")(x)
        out = nn.GroupNorm(self.ngroups, dtype=self.norm_dtype, name="gn1")(out)
        out = nn.relu(out).astype(self.compute_dtype)
        out = _Conv(self.planes, 3, self.stride, self.compute_dtype, name="conv2")(out)
        out = nn.GroupNorm(self.ngroups, dtype=self.norm_dtype, name="gn2")(out)
        out = nn.relu(out).astype(self.compute_dtype)
        out = _Conv(self.planes * self.expansion, 1, 1, self.compute_dtype, name="conv3")(out)
        out = nn.GroupNorm(self.ngroups, dtype=self.norm_dtype, name="gn3")(out)

        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = _Conv(
                self.planes * self.expansion, 1, self.stride, self.compute_dtype,
                name="downsample_conv",
            )(x)
            identity = nn.GroupNorm(
                self.ngroups, dtype=self.norm_dtype, name="downsample_gn"
            )(identity)
        # residual add in the GN output dtype (f32 by default) — downcasting
        # before the add would silently change the default path's numerics
        return nn.relu(out + identity).astype(self.compute_dtype)


class GNResNet(nn.Module):
    """DDPPO GroupNorm ResNet backbone (habitat resnet.resnet50 layout)."""

    in_channels: int = 1
    base_planes: int = 32
    ngroups: int = 16
    blocks: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @property
    def final_channels(self) -> int:
        return self.base_planes * 8 * 4  # 1024 for base_planes=32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        x = nn.Conv(
            self.base_planes, (7, 7), (2, 2), [(3, 3), (3, 3)],
            use_bias=False, dtype=self.compute_dtype, name="conv1",
        )(x)
        x = nn.GroupNorm(self.ngroups, dtype=self.norm_dtype, name="gn1")(x)
        x = nn.relu(x).astype(self.compute_dtype)
        x = max_pool_3x3_s2(x)
        planes = self.base_planes
        for li, nblocks in enumerate(self.blocks):
            stride = 1 if li == 0 else 2
            for bi in range(nblocks):
                x = GNBottleneck(
                    planes,
                    self.ngroups,
                    stride if bi == 0 else 1,
                    compute_dtype=self.compute_dtype,
                    norm_dtype=self.norm_dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x)
            planes *= 2
        return x


class GNResNetEncoder(nn.Module):
    """Backbone + 3x3 compression conv (habitat ResNetEncoder): for a 256x256
    depth input produces (B, 8, 8, 32) — 2048 flat features."""

    in_channels: int = 1
    base_planes: int = 32
    ngroups: int = 16
    spatial_size: int = 256
    blocks: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32

    @property
    def final_spatial(self) -> int:
        return self.spatial_size // 32

    @property
    def compression_channels(self) -> int:
        return int(round(2048 / (self.final_spatial**2)))

    @property
    def output_shape(self) -> Tuple[int, int, int]:  # (H, W, C) NHWC
        return (self.final_spatial, self.final_spatial, self.compression_channels)

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C) depth in [0, 1]
        x = GNResNet(
            self.in_channels, self.base_planes, self.ngroups, self.blocks,
            compute_dtype=self.compute_dtype, norm_dtype=self.norm_dtype,
            name="backbone",
        )(x)
        x = nn.Conv(
            self.compression_channels, (3, 3), (1, 1), [(1, 1), (1, 1)],
            use_bias=False, dtype=self.compute_dtype, name="compression_conv",
        )(x)
        x = nn.GroupNorm(1, dtype=self.norm_dtype, name="compression_gn")(x)
        return nn.relu(x).astype(self.compute_dtype)


class TVBottleneck(nn.Module):
    """torchvision Bottleneck (BN-eval): 1x1 -> 3x3(stride) -> 1x1 + skip."""

    planes: int
    stride: int = 1
    expansion: int = 4
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _Conv(self.planes, 1, 1, self.compute_dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _Conv(self.planes, 3, self.stride, self.compute_dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _Conv(self.planes * self.expansion, 1, 1, self.compute_dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * self.expansion, name="bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = _Conv(
                self.planes * self.expansion, 1, self.stride, self.compute_dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * self.expansion, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class TVResNet50(nn.Module):
    """torchvision resnet50 trunk up to layer4 (B, 7, 7, 2048 for 224 input).

    Heads (avgpool / fc / spatial pooling) live in the encoder wrappers
    (models/encoders/visual.py) to mirror the reference's hook-based feature
    extraction (resnet_encoders.py:195-205)."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3), values in [0, 1]
        x = x.astype(self.compute_dtype)
        x = nn.Conv(
            64, (7, 7), (2, 2), [(3, 3), (3, 3)],
            use_bias=False, dtype=self.compute_dtype, name="conv1",
        )(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        planes = 64
        for li, nblocks in enumerate(self.blocks):
            stride = 1 if li == 0 else 2
            for bi in range(nblocks):
                x = TVBottleneck(
                    planes,
                    stride if bi == 0 else 1,
                    compute_dtype=self.compute_dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x)
            planes *= 2
        return x
