"""Visual observation encoders (depth / RGB) with vector and spatial modes.

Wrappers matching the reference encoder surface:

* :class:`DepthEncoder` == VlnResnetDepthEncoder (resnet_encoders.py:13-108):
  GroupNorm ResNet50 over depth; vector mode = Flatten->Linear->ReLU; spatial
  mode appends a learned 64-dim per-position embedding and returns tokens.
* :class:`RGBEncoder` == TorchVisionResNet50 (resnet_encoders.py:111-237):
  frozen ImageNet ResNet50 over rgb/255; vector mode = avgpool->Linear->ReLU;
  spatial mode = layer4 -> adaptive-pool 4x4 -> +64-dim spatial embedding.
* :class:`SimpleDepthCNN` / :class:`SimpleRGBCNN` (simple_cnns.py:19-148):
  NatureCNN 3-conv stacks, config-selectable fallback.

Token layout: spatial outputs are returned as (B, S, C) token-major (the
reference keeps NCHW and flattens to (B, C, S); our 1x1 convs become Dense
over the last axis — identical math, TPU-friendly layout).

Frozen-ness: the policies wrap these in ``jax.lax.stop_gradient``, and the
optimizers mask the backbone subtrees out entirely
(training/optimizers.py:trainable_mask / masked).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .resnet import GNResNetEncoder, TVResNet50, adaptive_avg_pool2d


def visual_obs(observations, key: str, n: int):
    """Encoder input for one modality with time folded into batch:
    precomputed trunk features when present (shared-trunk steps or the
    feature-store training mode, training/featurize.py), raw frames
    otherwise."""
    fkey = f"{key}_features"
    if fkey in observations:
        v = observations[fkey]
        return {fkey: v.reshape((n,) + v.shape[2:])}
    v = observations[key]
    return {key: v.reshape((n,) + v.shape[2:])}


def visual_ref(observations):
    """The array that carries the (B, T) leading shape — rgb when frames are
    present, rgb_features in feature-mode batches."""
    return observations["rgb"] if "rgb" in observations else (
        observations["rgb_features"]
    )


class DepthEncoder(nn.Module):
    """GroupNorm-ResNet depth encoder (VlnResnetDepthEncoder equivalent)."""

    output_size: int = 128
    spatial_output: bool = False
    spatial_size: int = 256
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.float32

    @property
    def backbone_shape(self) -> Tuple[int, int, int]:
        s = self.spatial_size // 32
        return (s, s, int(round(2048 / s**2)))

    @property
    def output_shape(self):
        h, w, c = self.backbone_shape
        if self.spatial_output:
            return (h * w, c + 64)  # (S, C) tokens
        return (self.output_size,)

    @nn.compact
    def __call__(self, observations):
        if "depth_features" in observations:
            x = observations["depth_features"]
        else:
            # frozen backbone (reference freezes the whole ResNetEncoder incl.
            # compression, resnet_encoders.py:35-37); the heads below train
            x = jax.lax.stop_gradient(
                GNResNetEncoder(
                    spatial_size=self.spatial_size,
                    blocks=self.blocks,
                    compute_dtype=self.compute_dtype,
                    name="visual_encoder",
                )(observations["depth"])
            )
        b = x.shape[0]
        if self.spatial_output:
            h, w, c = x.shape[1], x.shape[2], x.shape[3]
            tokens = x.reshape(b, h * w, c)
            emb = self.param(
                "spatial_embeddings",
                nn.initializers.normal(1.0),
                (h * w, 64),
            )
            emb = jnp.broadcast_to(emb[None], (b, h * w, 64)).astype(tokens.dtype)
            return jnp.concatenate([tokens, emb], axis=-1)
        # channel-major flatten: torch's Flatten() sees NCHW
        # (resnet_encoders.py:58-62), so ported visual_fc weights expect
        # (C, H, W) input ordering
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.Dense(self.output_size, dtype=self.compute_dtype, name="visual_fc")(x)
        return nn.relu(x)


class RGBEncoder(nn.Module):
    """Frozen ImageNet-ResNet50 RGB encoder (TorchVisionResNet50 equivalent).

    Input rgb is uint8/float in [0,255]; only /255 is applied — the reference
    deliberately skips ImageNet mean/std normalization
    (resnet_encoders.py:212-213), preserved here.
    """

    output_size: int = 256
    spatial_output: bool = False
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    compute_dtype: Any = jnp.float32

    @property
    def output_shape(self):
        if self.spatial_output:
            return (16, 2048 + 64)  # 4x4 tokens, 2112 channels
        return (self.output_size,)

    @nn.compact
    def __call__(self, observations):
        if "rgb_features" in observations:
            feat = observations["rgb_features"]  # (B, S, C) precomputed tokens
            b = feat.shape[0]
        else:
            rgb = observations["rgb"].astype(self.compute_dtype) / 255.0
            # frozen ImageNet trunk (resnet_encoders.py:147-149); fc / spatial
            # embeddings below train
            feat = jax.lax.stop_gradient(
                TVResNet50(blocks=self.blocks, compute_dtype=self.compute_dtype, name="cnn")(rgb)
            )
            b = feat.shape[0]
        if self.spatial_output:
            if feat.ndim == 4:
                feat = adaptive_avg_pool2d(feat, (4, 4))
                feat = feat.reshape(b, 16, feat.shape[-1])
            emb = self.param(
                "spatial_embeddings", nn.initializers.normal(1.0), (16, 64)
            )
            emb = jnp.broadcast_to(emb[None], (b, 16, 64)).astype(feat.dtype)
            return jnp.concatenate([feat, emb], axis=-1)
        if feat.ndim == 4:
            feat = jnp.mean(feat, axis=(1, 2))  # avgpool
        x = nn.Dense(self.output_size, dtype=self.compute_dtype, name="fc")(feat)
        return nn.relu(x)


class SimpleCNN(nn.Module):
    """NatureCNN 3-conv encoder (reference simple_cnns.py:19-148): kernels
    8/4/3, strides 4/2/1, VALID padding, channels 32/64/32, Linear head."""

    output_size: int
    key: str  # "rgb" or "depth"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observations):
        x = observations[self.key].astype(self.compute_dtype)
        if self.key == "rgb":
            x = x / 255.0
        for feats, k, s, name in ((32, 8, 4, "conv1"), (64, 4, 2, "conv2")):
            x = nn.Conv(feats, (k, k), (s, s), "VALID", dtype=self.compute_dtype, name=name)(x)
            x = nn.relu(x)
        x = nn.Conv(32, (3, 3), (1, 1), "VALID", dtype=self.compute_dtype, name="conv3")(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.output_size, dtype=self.compute_dtype, name="fc")(x)
        return nn.relu(x)


def SimpleDepthCNN(output_size, compute_dtype=jnp.float32):
    return SimpleCNN(output_size, "depth", compute_dtype)


def SimpleRGBCNN(output_size, compute_dtype=jnp.float32):
    return SimpleCNN(output_size, "rgb", compute_dtype)
