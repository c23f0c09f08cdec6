"""Encoder golden tests: flax encoders vs torch modules built to the exact
layouts of the reference's dependencies (habitat ddppo GroupNorm resnet,
torchvision resnet50, HF BERT, NatureCNN) with weights ported through
utils/weight_port — validating both the math and the porting path."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from robo_vln_tpu.models.encoders.bert import BertEncoder
from robo_vln_tpu.models.encoders.resnet import (
    GNResNetEncoder,
    TVResNet50,
    adaptive_avg_pool2d,
)
from robo_vln_tpu.utils import weight_port as wp

BLOCKS = (1, 1, 1, 1)  # small stand-in for (3,4,6,3); same code path


# -- torch reference constructions (dependency layouts, random weights) -------

def conv1x1(i, o, s=1):
    return tnn.Conv2d(i, o, 1, s, bias=False)


def conv3x3(i, o, s=1):
    return tnn.Conv2d(i, o, 3, s, 1, bias=False)


class GNBottleneckT(tnn.Module):
    """habitat ddppo resnet.Bottleneck layout (convs Sequential + downsample)."""

    expansion = 4

    def __init__(self, inplanes, planes, ngroups, stride=1):
        super().__init__()
        self.convs = tnn.Sequential(
            conv1x1(inplanes, planes), tnn.GroupNorm(ngroups, planes), tnn.ReLU(True),
            conv3x3(planes, planes, stride), tnn.GroupNorm(ngroups, planes), tnn.ReLU(True),
            conv1x1(planes, planes * 4), tnn.GroupNorm(ngroups, planes * 4),
        )
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                conv1x1(inplanes, planes * 4, stride),
                tnn.GroupNorm(ngroups, planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        out = self.convs(x)
        identity = x if self.downsample is None else self.downsample(x)
        return tnn.functional.relu(out + identity)


class GNResNetEncoderT(tnn.Module):
    """habitat ResNetEncoder layout: backbone.{conv1(Sequential),layerN} +
    compression(Sequential)."""

    def __init__(self, in_ch=1, base_planes=32, ngroups=16, blocks=BLOCKS, spatial=64):
        super().__init__()
        backbone = tnn.Module()
        backbone.conv1 = tnn.Sequential(
            tnn.Conv2d(in_ch, base_planes, 7, 2, 3, bias=False),
            tnn.GroupNorm(ngroups, base_planes),
            tnn.ReLU(True),
        )
        inplanes = base_planes
        planes = base_planes
        for li, n in enumerate(blocks):
            stride = 1 if li == 0 else 2
            layers = []
            for bi in range(n):
                layers.append(GNBottleneckT(inplanes, planes, ngroups, stride if bi == 0 else 1))
                inplanes = planes * 4
            setattr(backbone, f"layer{li + 1}", tnn.Sequential(*layers))
            planes *= 2
        self.backbone = backbone
        final_spatial = spatial // 32
        nc = int(round(2048 / final_spatial**2))
        self.compression = tnn.Sequential(
            conv3x3(inplanes, nc), tnn.GroupNorm(1, nc), tnn.ReLU(True)
        )
        self.maxpool = tnn.MaxPool2d(3, 2, 1)

    def forward(self, x):
        x = self.backbone.conv1(x)
        x = self.maxpool(x)
        for li in range(4):
            x = getattr(self.backbone, f"layer{li + 1}")(x)
        return self.compression(x)


def test_gn_resnet_encoder_matches_torch(rng):
    torch.manual_seed(0)
    tmod = GNResNetEncoderT().eval()
    x = rng.random((2, 64, 64, 1), np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    params = wp.port_gn_resnet_encoder(
        wp.to_numpy_state_dict(tmod.state_dict()), blocks=BLOCKS
    )
    enc = GNResNetEncoder(spatial_size=64, blocks=BLOCKS)
    out = enc.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


class TVBottleneckT(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = conv1x1(inplanes, planes)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, stride)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = conv1x1(planes, planes * 4)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                conv1x1(inplanes, planes * 4, stride), tnn.BatchNorm2d(planes * 4)
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = tnn.functional.relu(self.bn1(self.conv1(x)))
        out = tnn.functional.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return tnn.functional.relu(out + idt)


class TVResNetT(tnn.Module):
    """torchvision resnet50 trunk layout (eval BN)."""

    def __init__(self, blocks=BLOCKS):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes, planes = 64, 64
        for li, n in enumerate(blocks):
            stride = 1 if li == 0 else 2
            layers = []
            for bi in range(n):
                layers.append(TVBottleneckT(inplanes, planes, stride if bi == 0 else 1))
                inplanes = planes * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*layers))
            planes *= 2

    def forward(self, x):
        x = self.maxpool(tnn.functional.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x


def test_tv_resnet50_matches_torch(rng):
    torch.manual_seed(1)
    tmod = TVResNetT()
    # randomize BN running stats to make the eval-affine non-trivial
    for m in tmod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    tmod.eval()
    x = rng.random((2, 64, 64, 3), np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    params, stats = wp.port_tv_resnet50(
        wp.to_numpy_state_dict(tmod.state_dict()), blocks=BLOCKS
    )
    out = TVResNet50(blocks=BLOCKS).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)


def test_adaptive_avg_pool_matches_torch(rng):
    x = rng.random((2, 7, 7, 5), np.float32)
    ref = (
        tnn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), (4, 4)
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    out = adaptive_avg_pool2d(jnp.asarray(x), (4, 4))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_bert_matches_transformers(rng):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
    )
    torch.manual_seed(2)
    tmod = BertModel(cfg).eval()
    ids = rng.integers(1, 100, size=(2, 13))
    with torch.no_grad():
        ref = tmod(torch.from_numpy(ids)).last_hidden_state.numpy()

    params = wp.port_bert(wp.to_numpy_state_dict(tmod.state_dict()), num_layers=2)
    enc = BertEncoder(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=40,
    )
    out = enc.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_simple_cnn_matches_torch(rng):
    from robo_vln_tpu.models.encoders.visual import SimpleCNN

    torch.manual_seed(3)
    tmod = tnn.Sequential(
        tnn.Conv2d(1, 32, 8, 4), tnn.ReLU(True),
        tnn.Conv2d(32, 64, 4, 2), tnn.ReLU(True),
        tnn.Conv2d(64, 32, 3, 1), tnn.Flatten(),
        tnn.Linear(32 * 4 * 4, 16), tnn.ReLU(True),
    ).eval()
    x = rng.random((2, 64, 64, 1), np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    sd = wp.to_numpy_state_dict(tmod.state_dict())
    # torch Flatten on NCHW != flatten on NHWC: permute the fc input dims
    w_fc = sd["6.weight"].reshape(16, 32, 4, 4).transpose(0, 2, 3, 1).reshape(16, -1)
    params = {
        "conv1": {"kernel": np.transpose(sd["0.weight"], (2, 3, 1, 0)), "bias": sd["0.bias"]},
        "conv2": {"kernel": np.transpose(sd["2.weight"], (2, 3, 1, 0)), "bias": sd["2.bias"]},
        "conv3": {"kernel": np.transpose(sd["4.weight"], (2, 3, 1, 0)), "bias": sd["4.bias"]},
        "fc": {"kernel": w_fc.T, "bias": sd["6.bias"]},
    }
    out = SimpleCNN(16, "depth").apply({"params": params}, {"depth": jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_instruction_encoder_final_and_seq(rng):
    """InstructionEncoder vs torch embedding+packed-LSTM (final & full-seq)."""
    from robo_vln_tpu.models.encoders.instruction import InstructionEncoder

    V, E, H, B, L = 30, 8, 12, 3, 9
    torch.manual_seed(4)
    emb = tnn.Embedding(V, E, padding_idx=0)
    rnn = tnn.LSTM(E, H, batch_first=True)
    ids = rng.integers(1, V, size=(B, L))
    ids[0, 6:] = 0
    ids[2, 4:] = 0
    lengths = (ids != 0).sum(1)

    with torch.no_grad():
        e = emb(torch.from_numpy(ids))
        packed = tnn.utils.rnn.pack_padded_sequence(
            e, torch.from_numpy(lengths), batch_first=True, enforce_sorted=False
        )
        out_p, (h_p, _) = rnn(packed)
        final_ref = h_p[0].numpy()
        seq_ref = (
            tnn.utils.rnn.pad_packed_sequence(out_p, batch_first=True, total_length=L)[0]
            .permute(0, 2, 1)
            .numpy()
        )

    sd = wp.to_numpy_state_dict(rnn.state_dict())
    rnn_params = {
        "w_ih": sd["weight_ih_l0"].T,
        "w_hh": sd["weight_hh_l0"].T,
        "b_ih": sd["bias_ih_l0"],
        "b_hh": sd["bias_hh_l0"],
    }
    params = {
        "embedding": emb.weight.detach().numpy(),
        "fwd": rnn_params,
    }
    enc = InstructionEncoder(
        vocab_size=V, embedding_size=E, hidden_size=H,
        use_pretrained_embeddings=False, final_state_only=True,
    )
    out = enc.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), final_ref, atol=1e-5)

    enc2 = InstructionEncoder(
        vocab_size=V, embedding_size=E, hidden_size=H,
        use_pretrained_embeddings=False, final_state_only=False,
    )
    out2 = enc2.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out2), seq_ref, atol=1e-5)
