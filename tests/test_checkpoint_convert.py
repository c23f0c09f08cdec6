"""Reference-checkpoint converters: forward parity of converted HCM and CMA
state dicts.

Torch mirrors below reproduce the reference modules' structure (exact
state_dict key names) and forward semantics at test scale:

* Seq2Seq_HighLevel_CMA (seq2seq_highlevel_cma.py:29-233)
* Seq2Seq_LowLevel (seq2seq_lowlevel.py:21-162)
* CMANet (cma.py:20-333)
* Visual_Ling_Attn + InterModuleAttnLayer + MultiHeadAttention +
  PositionWiseFeedForward (transformer/transformer.py:25-281)

The converters (training/checkpoint.py) map those state dicts into flax
policy variables; each test asserts end-to-end forward parity <= 1e-4.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from tests.test_encoders import BLOCKS, GNResNetEncoderT, TVResNetT
from tests.test_rnn import torch_masked_rnn
from robo_vln_tpu.models.transformer import sinusoid_encoding_table
from robo_vln_tpu.training import checkpoint as ckpt_lib


# -- torch mirrors of the reference transformer blocks -------------------------

class SDPAttentionT(tnn.Module):
    """ScaledDotProductAttention (transformer.py:46-109)."""

    def __init__(self, d_model, d_k, d_v, h):
        super().__init__()
        self.fc_q = tnn.Linear(d_model, h * d_k)
        self.fc_k = tnn.Linear(d_model, h * d_k)
        self.fc_v = tnn.Linear(d_model, h * d_v)
        self.fc_o = tnn.Linear(h * d_v, d_model)
        self.d_k, self.d_v, self.h = d_k, d_v, h

    def forward(self, queries, keys, values):
        b, nq = queries.shape[:2]
        nk = keys.shape[1]
        q = self.fc_q(queries).view(b, nq, self.h, self.d_k).permute(0, 2, 1, 3)
        k = self.fc_k(keys).view(b, nk, self.h, self.d_k).permute(0, 2, 3, 1)
        v = self.fc_v(values).view(b, nk, self.h, self.d_v).permute(0, 2, 1, 3)
        att = torch.softmax(torch.matmul(q, k) / np.sqrt(self.d_k), -1)
        out = torch.matmul(att, v).permute(0, 2, 1, 3).reshape(b, nq, -1)
        return self.fc_o(out)


class MHAttentionT(tnn.Module):
    """MultiHeadAttention: post-LN residual (transformer.py:111-126)."""

    def __init__(self, d_model, d_k, d_v, h):
        super().__init__()
        self.attention = SDPAttentionT(d_model, d_k, d_v, h)
        self.layer_norm = tnn.LayerNorm(d_model)

    def forward(self, q, k, v):
        return self.layer_norm(q + self.attention(q, k, v))


class PWFFT(tnn.Module):
    """PositionWiseFeedForward (transformer.py:25-43)."""

    def __init__(self, d_model, d_ff):
        super().__init__()
        self.fc1 = tnn.Linear(d_model, d_ff)
        self.fc2 = tnn.Linear(d_ff, d_model)
        self.layer_norm = tnn.LayerNorm(d_model)

    def forward(self, x):
        return self.layer_norm(x + self.fc2(tF.relu(self.fc1(x))))


class InterModuleAttnLayerT(tnn.Module):
    """InterModuleAttnLayer (transformer.py:209-221)."""

    def __init__(self, d_model, d_att, h, d_ff):
        super().__init__()
        self.enc_att = MHAttentionT(d_model, d_att, d_att, h)
        self.pwff = PWFFT(d_model, d_ff)

    def forward(self, input_1, input_2):
        return self.pwff(self.enc_att(input_1, input_2, input_2))


class VisualLingAttnT(tnn.Module):
    """Visual_Ling_Attn (transformer.py:251-281): shared layer_norm on both
    streams, sinusoid PE on the instruction queries."""

    def __init__(self, d_model, h, d_ff, n_layers, vis_in, ins_in):
        super().__init__()
        d_att = d_model // h
        self.layers = tnn.ModuleList(
            [InterModuleAttnLayerT(d_model, d_att, h, d_ff) for _ in range(n_layers)]
        )
        self.vis_fc = tnn.Linear(vis_in, d_model)
        self.ins_fc = tnn.Linear(ins_in, d_model)
        self.layer_norm = tnn.LayerNorm(d_model)

    def forward(self, instruction, visual):
        out = self.layer_norm(tF.relu(self.vis_fc(visual)))
        ins = self.layer_norm(tF.relu(self.ins_fc(instruction)))
        pe = torch.from_numpy(
            np.asarray(sinusoid_encoding_table(ins.shape[1], ins.shape[2]))
        )
        ins = ins + pe[None]
        for l in self.layers:
            out = l(ins, out)
        return out


# -- torch mirrors of the reference visual encoders ---------------------------

def _scrambled_spatial(emb: tnn.Embedding, b, h, w):
    """Reference spatial-embedding concat (resnet_encoders.py:91-102): the
    row-major .view(1, -1, h, w) scrambles (token, dim)."""
    return (
        emb(torch.arange(emb.num_embeddings))
        .view(1, -1, h, w)
        .expand(b, emb.embedding_dim, h, w)
    )


class DepthEncT(tnn.Module):
    """VlnResnetDepthEncoder layout (resnet_encoders.py:13-108).  The trunk
    keeps the nominal 256px compression width (32ch) but runs on 64px input
    (2x2 -> 4 tokens), matching the flax DepthEncoder's config-derived
    compression_channels."""

    def __init__(self, spatial_output, out=8):
        super().__init__()
        self.visual_encoder = GNResNetEncoderT(in_ch=1, spatial=256, blocks=BLOCKS)
        c, s2 = 32, DEPTH_S
        self.spatial_output = spatial_output
        if spatial_output:
            self.spatial_embeddings = tnn.Embedding(s2, 64)
        else:
            self.visual_fc = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(c * s2, out), tnn.ReLU(True)
            )

    def forward(self, depth_nchw):
        x = self.visual_encoder(depth_nchw)
        if self.spatial_output:
            b, c, h, w = x.shape
            return torch.cat([x, _scrambled_spatial(self.spatial_embeddings, b, h, w)], 1)
        return self.visual_fc(x)


class RGBEncT(tnn.Module):
    """TorchVisionResNet50 layout (resnet_encoders.py:111-237); rgb/255 only."""

    def __init__(self, spatial_output, out=16):
        super().__init__()
        self.cnn = TVResNetT(blocks=BLOCKS)
        self.spatial_output = spatial_output
        if spatial_output:
            self.spatial_embeddings = tnn.Embedding(16, 64)
        else:
            self.fc = tnn.Linear(2048, out)

    def forward(self, rgb_nchw):
        x = self.cnn(rgb_nchw / 255.0)
        if self.spatial_output:
            x = tF.adaptive_avg_pool2d(x, (4, 4))
            b, c, h, w = x.shape
            return torch.cat([x, _scrambled_spatial(self.spatial_embeddings, b, h, w)], 1)
        x = tF.adaptive_avg_pool2d(x, 1).flatten(1)
        return tF.relu(self.fc(x))


class RNNBoxT(tnn.Module):
    """RNNStateEncoder key layout: the LSTM lives under .rnn."""

    def __init__(self, d_in, h):
        super().__init__()
        self.rnn = tnn.LSTM(d_in, h)


# -- full-policy mirrors -------------------------------------------------------

BERT_H, VLA_D, VLA_H, VLA_FF, VIS_IN = 32, 16, 2, 32, 16
OUT_D, OUT_R, H_STATE = 8, 16, 32
# GNResNetEncoder keeps the reference's nominal 256px compression sizing
# (32 channels) regardless of runtime input; 64px input -> 2x2 -> 4 tokens
DEPTH_C = 32 + 64
DEPTH_S = 4
RGB_C = 2048 + 64


def tiny_bert():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=60, hidden_size=BERT_H, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
    )
    return BertModel(cfg).eval()


class TorchHighLevelCMA(tnn.Module):
    """Seq2Seq_HighLevel_CMA at test scale (seq2seq_highlevel_cma.py:29-233)."""

    def __init__(self):
        super().__init__()
        self.embedding_layer = tiny_bert()
        self.ins_fc = tnn.Linear(BERT_H, VLA_D)  # defined-but-unused (:46)
        self.depth_encoder = DepthEncT(spatial_output=True)
        self.rgb_encoder = RGBEncT(spatial_output=True)
        self.rgb_linear = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1), tnn.Flatten(),
            tnn.Linear(RGB_C, OUT_R), tnn.ReLU(True),
        )
        self.depth_linear = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(DEPTH_C * DEPTH_S, OUT_D), tnn.ReLU(True)
        )
        self.rgb_kv = tnn.Conv1d(RGB_C, VIS_IN, 1)
        self.depth_kv = tnn.Conv1d(DEPTH_C, VIS_IN, 1)
        self.image_cm_encoder = VisualLingAttnT(
            VLA_D, VLA_H, VLA_FF, 1, VIS_IN, BERT_H
        )
        self.state_encoder = RNNBoxT(VLA_D * 2 + OUT_D + OUT_R, H_STATE)
        self.progress_monitor = tnn.Linear(H_STATE, 1)
        self.linear = tnn.Linear(H_STATE, 4)

    def forward(self, rgb, depth, instruction, masks):
        # rgb (T,128,128,3), depth (T,64,64,1), instruction (1,L), masks (T,)
        T = rgb.shape[0]
        depth_embedding = torch.flatten(
            self.depth_encoder(depth.permute(0, 3, 1, 2)), 2
        )  # (T, 576, 4)
        rgb_embedding = torch.flatten(
            self.rgb_encoder(rgb.permute(0, 3, 1, 2)), 2
        )  # (T, 2112, 16)
        ins = instruction.expand(T, instruction.shape[1])
        with torch.no_grad():
            embedded = self.embedding_layer(ins)[0]  # no attn mask (:192-196)
        rgb_spatial = self.rgb_kv(rgb_embedding)
        depth_spatial = self.depth_kv(depth_embedding)
        ins_rgb_att = self.image_cm_encoder(embedded, rgb_spatial.permute(0, 2, 1))
        ins_depth_att = self.image_cm_encoder(embedded, depth_spatial.permute(0, 2, 1))
        ins_rgb_att = ins_rgb_att.mean(1)  # cross_pooler (:209-210)
        ins_depth_att = ins_depth_att.mean(1)
        rgb_in = self.rgb_linear(rgb_embedding)
        depth_in = self.depth_linear(depth_embedding)
        x = torch.cat((rgb_in, depth_in, ins_rgb_att, ins_depth_att), dim=1)
        h0 = (torch.zeros(1, 1, H_STATE), torch.zeros(1, 1, H_STATE))
        y, _ = torch_masked_rnn(
            self.state_encoder.rnn, x.unsqueeze(1), h0, masks.unsqueeze(1)
        )
        return self.linear(y[:, 0])


class TorchLowLevel(tnn.Module):
    """Seq2Seq_LowLevel at test scale (seq2seq_lowlevel.py:21-162)."""

    def __init__(self):
        super().__init__()
        self.depth_encoder = DepthEncT(spatial_output=False, out=OUT_D)
        self.rgb_encoder = RGBEncT(spatial_output=False, out=OUT_R)
        self.sub_task_embedding = tnn.Embedding(5, 32, padding_idx=4)
        self.state_encoder = RNNBoxT(OUT_D + OUT_R + 32, H_STATE)
        self.progress_monitor = tnn.Linear(H_STATE, 1)
        self.linear = tnn.Linear(H_STATE, 2)
        self.stop_linear = tnn.Linear(H_STATE, 1)

    def forward(self, rgb, depth, discrete, masks):
        d = self.depth_encoder(depth.permute(0, 3, 1, 2))
        r = self.rgb_encoder(rgb.permute(0, 3, 1, 2))
        s = self.sub_task_embedding(discrete)
        x = torch.cat([d, r, s], dim=1)
        h0 = (torch.zeros(1, 1, H_STATE), torch.zeros(1, 1, H_STATE))
        y, _ = torch_masked_rnn(
            self.state_encoder.rnn, x.unsqueeze(1), h0, masks.unsqueeze(1)
        )
        y = y[:, 0]
        return self.linear(y), self.stop_linear(y)


INS_E, INS_H = 8, 12
INS_C = 2 * INS_H  # bidirectional


class InsEncT(tnn.Module):
    """InstructionEncoder layout (instruction_encoder.py:9-92): embedding +
    packed bi-LSTM, full-seq channel-major output."""

    def __init__(self, V=60):
        super().__init__()
        self.embedding_layer = tnn.Embedding(V, INS_E, padding_idx=0)
        self.encoder_rnn = tnn.LSTM(
            INS_E, INS_H, batch_first=True, bidirectional=True
        )

    def forward(self, ids):
        lengths = (ids != 0).long().sum(1)
        packed = tnn.utils.rnn.pack_padded_sequence(
            self.embedding_layer(ids), lengths, batch_first=True,
            enforce_sorted=False,
        )
        out, _ = self.encoder_rnn(packed)
        out = tnn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=ids.shape[1]
        )[0]
        return out.permute(0, 2, 1)  # (B, C, L)


class TorchCMA(tnn.Module):
    """CMANet at test scale (cma.py:20-333), use_prev_action=False."""

    def __init__(self):
        super().__init__()
        self.instruction_encoder = InsEncT()
        self.depth_encoder = DepthEncT(spatial_output=True)
        self.rgb_encoder = RGBEncT(spatial_output=True)
        self.rgb_linear = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1), tnn.Flatten(),
            tnn.Linear(RGB_C, OUT_R), tnn.ReLU(True),
        )
        self.depth_linear = tnn.Sequential(
            tnn.Flatten(), tnn.Linear(DEPTH_C * DEPTH_S, OUT_D), tnn.ReLU(True)
        )
        self.state_encoder = RNNBoxT(OUT_D + OUT_R, H_STATE)
        self.rgb_kv = tnn.Conv1d(RGB_C, H_STATE // 2 + OUT_R, 1)
        self.depth_kv = tnn.Conv1d(DEPTH_C, H_STATE // 2 + OUT_D, 1)
        self.state_q = tnn.Linear(H_STATE, H_STATE // 2)
        self.text_k = tnn.Conv1d(INS_C, H_STATE // 2, 1)
        self.text_q = tnn.Linear(INS_C, H_STATE // 2)
        self.second_state_compress = tnn.Sequential(
            tnn.Linear(H_STATE + INS_C + OUT_R + OUT_D, H_STATE), tnn.ReLU(True)
        )
        self.second_state_encoder = RNNBoxT(H_STATE, H_STATE)
        self.progress_monitor = tnn.Linear(H_STATE, 1)
        self.linear = tnn.Linear(H_STATE, 2)
        self.stop_linear = tnn.Linear(H_STATE, 1)
        self._scale = 1.0 / ((H_STATE // 2) ** 0.5)

    def _attn(self, q, k, v, mask=None):
        logits = torch.einsum("nc, nci -> ni", q, k)
        if mask is not None:
            logits = logits - mask.float() * 1e8
        return torch.einsum("ni, nci -> nc", tF.softmax(logits * self._scale, 1), v)

    def forward(self, rgb, depth, instruction, masks):
        T = rgb.shape[0]
        depth_embedding = torch.flatten(
            self.depth_encoder(depth.permute(0, 3, 1, 2)), 2
        )
        rgb_embedding = torch.flatten(self.rgb_encoder(rgb.permute(0, 3, 1, 2)), 2)
        ins = instruction.expand(T, instruction.shape[1])
        instruction_embedding = self.instruction_encoder(ins)  # (T, C, L)

        rgb_in = self.rgb_linear(rgb_embedding)
        depth_in = self.depth_linear(depth_embedding)
        state_in = torch.cat([rgb_in, depth_in], dim=1)
        h0 = (torch.zeros(1, 1, H_STATE), torch.zeros(1, 1, H_STATE))
        state, _ = torch_masked_rnn(
            self.state_encoder.rnn, state_in.unsqueeze(1), h0, masks.unsqueeze(1)
        )
        state = state[:, 0]

        text_state_q = self.state_q(state)
        text_state_k = self.text_k(instruction_embedding)
        text_mask = (instruction_embedding == 0.0).all(dim=1)
        text_embedding = self._attn(
            text_state_q, text_state_k, instruction_embedding, text_mask
        )
        rgb_k, rgb_v = torch.split(
            self.rgb_kv(rgb_embedding), H_STATE // 2, dim=1
        )
        depth_k, depth_v = torch.split(
            self.depth_kv(depth_embedding), H_STATE // 2, dim=1
        )
        text_q = self.text_q(text_embedding)
        rgb_att = self._attn(text_q, rgb_k, rgb_v)
        depth_att = self._attn(text_q, depth_k, depth_v)

        x = torch.cat([state, text_embedding, rgb_att, depth_att], dim=1)
        x = self.second_state_compress(x)
        h0b = (torch.zeros(1, 1, H_STATE), torch.zeros(1, 1, H_STATE))
        y, _ = torch_masked_rnn(
            self.second_state_encoder.rnn, x.unsqueeze(1), h0b, masks.unsqueeze(1)
        )
        y = y[:, 0]
        return self.linear(y), self.stop_linear(y)


# -- configs / data -------------------------------------------------------------

def _hier_config():
    from tests.test_policies import tiny_model_config

    mc = tiny_model_config()
    mc.BERT.vocab_size = 60
    mc.BERT.max_position_embeddings = 40
    mc.VISUAL_LING_ATTN.d_model = VLA_D
    mc.VISUAL_LING_ATTN.h = VLA_H
    mc.VISUAL_LING_ATTN.d_ff = VLA_FF
    mc.VISUAL_LING_ATTN.vis_in_features = VIS_IN
    mc.VISUAL_LING_ATTN.N = 1
    mc.DEPTH_ENCODER.output_size = OUT_D
    mc.RGB_ENCODER.output_size = OUT_R
    mc.DEPTH_ENCODER.blocks = list(BLOCKS)
    mc.RGB_ENCODER.blocks = list(BLOCKS)
    mc.STATE_ENCODER.hidden_size = H_STATE
    return mc


def _data(rng, T=3, L=10):
    rgb = rng.integers(0, 255, (T, 128, 128, 3)).astype(np.float32)
    depth = rng.random((T, 64, 64, 1)).astype(np.float32)
    instruction = rng.integers(1, 60, (1, L))
    instruction[0, 7:] = 0
    masks = np.ones(T, np.float32)
    masks[0] = 0.0
    return rgb, depth, instruction, masks


def test_hierarchical_converter_forward_parity(rng):
    torch.manual_seed(0)
    thigh = TorchHighLevelCMA().eval()
    tlow = TorchLowLevel().eval()
    rgb, depth, instruction, masks = _data(rng)
    T = rgb.shape[0]
    discrete = rng.integers(0, 5, (T,))

    with torch.no_grad():
        logits_ref = thigh(
            torch.from_numpy(rgb), torch.from_numpy(depth),
            torch.from_numpy(instruction), torch.from_numpy(masks),
        ).numpy()
        act_ref, stop_ref = tlow(
            torch.from_numpy(rgb), torch.from_numpy(depth),
            torch.from_numpy(discrete), torch.from_numpy(masks),
        )
        act_ref, stop_ref = act_ref.numpy(), stop_ref.numpy()

    ckpt = {
        "high_level_state_dict": thigh.state_dict(),
        "low_level_state_dict": tlow.state_dict(),
    }
    high_vars, low_vars = ckpt_lib.convert_hierarchical_checkpoint(
        ckpt, blocks=BLOCKS
    )

    from robo_vln_tpu.models.hierarchical import HighLevelPolicy, LowLevelPolicy

    mc = _hier_config()
    high = HighLevelPolicy(model_config=mc)
    low = LowLevelPolicy(model_config=mc)
    obs = {
        "rgb": jnp.asarray(rgb)[None],
        "depth": jnp.asarray(depth)[None],
        "instruction": jnp.asarray(instruction),
        "progress": jnp.zeros((1, T)),
    }
    m = jnp.asarray(masks)[None]
    logits, _ = high.apply(
        high_vars, obs, high.initial_hidden(1), jnp.zeros((1, T, 2)), m
    )
    np.testing.assert_allclose(np.asarray(logits)[0], logits_ref, atol=1e-4)

    act, stop, _ = low.apply(
        low_vars, obs, low.initial_hidden(1), jnp.zeros((1, T, 2)), m,
        jnp.asarray(discrete)[None],
    )
    np.testing.assert_allclose(np.asarray(act)[0], act_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stop)[0], stop_ref, atol=1e-4)


def test_cma_converter_forward_parity(rng):
    torch.manual_seed(1)
    tcma = TorchCMA().eval()
    rgb, depth, instruction, masks = _data(rng)
    T = rgb.shape[0]

    with torch.no_grad():
        act_ref, stop_ref = tcma(
            torch.from_numpy(rgb), torch.from_numpy(depth),
            torch.from_numpy(instruction), torch.from_numpy(masks),
        )
        act_ref, stop_ref = act_ref.numpy(), stop_ref.numpy()

    variables = ckpt_lib.convert_cma_state_dict(tcma.state_dict(), blocks=BLOCKS)

    from robo_vln_tpu.models.cma import CMAPolicy

    mc = _hier_config()
    mc.INSTRUCTION_ENCODER.vocab_size = 60
    mc.INSTRUCTION_ENCODER.embedding_size = INS_E
    mc.INSTRUCTION_ENCODER.hidden_size = INS_H
    mc.INSTRUCTION_ENCODER.bidirectional = True
    mc.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    policy = CMAPolicy(model_config=mc)
    obs = {
        "rgb": jnp.asarray(rgb)[None],
        "depth": jnp.asarray(depth)[None],
        "instruction": jnp.asarray(instruction),
        "progress": jnp.zeros((1, T)),
    }
    m = jnp.asarray(masks)[None]
    act, stop, _, _ = policy.apply(
        variables, obs, policy.initial_hidden(1), jnp.zeros((1, T, 2)), m
    )
    np.testing.assert_allclose(np.asarray(act)[0], act_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stop)[0], stop_ref, atol=1e-4)


def test_convert_torch_checkpoint_dispatch(tmp_path, rng):
    """convert_torch_checkpoint() routes by state-dict shape."""
    torch.manual_seed(2)
    ckpt = {
        "high_level_state_dict": TorchHighLevelCMA().state_dict(),
        "low_level_state_dict": TorchLowLevel().state_dict(),
        "config": {},
    }
    p = str(tmp_path / "hcm.pth")
    torch.save(ckpt, p)
    kind, (hv, lv) = ckpt_lib.convert_torch_checkpoint(p, blocks=BLOCKS)
    assert kind == "hierarchical"
    assert "embedding_layer" in hv["params"]
    assert "sub_task_embedding" in lv["params"]

    cma = {"state_dict": TorchCMA().state_dict(), "config": {}}
    p2 = str(tmp_path / "cma.pth")
    torch.save(cma, p2)
    kind2, cv = ckpt_lib.convert_torch_checkpoint(p2, blocks=BLOCKS)
    assert kind2 == "cma"
    assert "second_state_encoder" in cv["params"]


# -- full production scale ------------------------------------------------------

def _production_bert():
    """bert-base-uncased shape (seq2seq_highlevel_cma.py:45): 12 layers,
    h=768, 12 heads, ff=3072, vocab 30522 — random init, real layout."""
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, type_vocab_size=2,
    )
    return BertModel(cfg).eval()


@pytest.mark.slow
def test_full_scale_converter_smoke(tmp_path, rng, monkeypatch):
    """Round-trip a PRODUCTION-shaped reference checkpoint (the real
    `HCM_Agent.pth` layout, README.md:251-255): ResNet50 [3,4,6,3] trunks x2
    per module, BERT-base-12, h=512 — ~177M params, ~700 MB on disk — through
    convert_torch_checkpoint and one full-scale forward parity check.

    The reduced-scale tests above pin the math; this pins the exact
    Sequential-index/key handling at real depths (VERDICT r3 next #7).  The
    torch mirrors are reused with their dimension globals patched to the
    production values (config/default.py MODEL defaults):
    depth DDPPO ResNet50 @256px -> (32, 8, 8) spatial (+64-dim embeddings),
    rgb TorchVision ResNet50 @224px -> (2048, 4, 4) pooled (+64)."""
    import sys

    # patch the module object the mirror classes actually read their globals
    # from (pytest may import this file under a different module identity
    # than `tests.test_checkpoint_convert`)
    M = sys.modules[TorchHighLevelCMA.__module__]

    for k, v in dict(
        BERT_H=768, VLA_D=256, VLA_H=4, VLA_FF=1024, VIS_IN=256,
        OUT_D=128, OUT_R=256, H_STATE=512, BLOCKS=(3, 4, 6, 3),
        DEPTH_S=64, DEPTH_C=32 + 64, RGB_C=2048 + 64,
    ).items():
        monkeypatch.setattr(M, k, v)
    monkeypatch.setattr(M, "tiny_bert", _production_bert)

    torch.manual_seed(0)
    thigh = TorchHighLevelCMA().eval()
    tlow = TorchLowLevel().eval()
    n_params = sum(p.numel() for p in thigh.parameters()) + sum(
        p.numel() for p in tlow.parameters()
    )
    assert 150e6 < n_params < 210e6, f"unexpected total params {n_params}"

    path = str(tmp_path / "HCM_Agent_shape.pth")
    torch.save(
        {
            "high_level_state_dict": thigh.state_dict(),
            "low_level_state_dict": tlow.state_dict(),
            "config": {},
        },
        path,
    )
    import os

    size_mb = os.path.getsize(path) / 1e6
    assert size_mb > 500, f"checkpoint only {size_mb:.0f} MB — not full scale"

    T, L = 2, 24
    rgb = rng.integers(0, 255, (T, 224, 224, 3)).astype(np.float32)
    depth = rng.random((T, 256, 256, 1)).astype(np.float32)
    instruction = rng.integers(1, 30522, (1, L))
    instruction[0, 16:] = 0
    masks = np.ones(T, np.float32)
    masks[0] = 0.0
    discrete = rng.integers(0, 5, (T,))

    with torch.no_grad():
        logits_ref = thigh(
            torch.from_numpy(rgb), torch.from_numpy(depth),
            torch.from_numpy(instruction), torch.from_numpy(masks),
        ).numpy()
        act_ref, stop_ref = tlow(
            torch.from_numpy(rgb), torch.from_numpy(depth),
            torch.from_numpy(discrete), torch.from_numpy(masks),
        )
        act_ref, stop_ref = act_ref.numpy(), stop_ref.numpy()
    del thigh, tlow

    kind, (high_vars, low_vars) = ckpt_lib.convert_torch_checkpoint(
        path, blocks=(3, 4, 6, 3)
    )
    assert kind == "hierarchical"

    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.models.hierarchical import HighLevelPolicy, LowLevelPolicy

    cfg = get_config().clone().defrost()
    mc = cfg.MODEL
    mc.INSTRUCTION_ENCODER.use_pretrained_embeddings = False
    high = HighLevelPolicy(model_config=mc)
    low = LowLevelPolicy(model_config=mc)
    obs = {
        "rgb": jnp.asarray(rgb)[None],
        "depth": jnp.asarray(depth)[None],
        "instruction": jnp.asarray(instruction),
        "progress": jnp.zeros((1, T)),
    }
    m = jnp.asarray(masks)[None]
    logits, _ = high.apply(
        high_vars, obs, high.initial_hidden(1), jnp.zeros((1, T, 2)), m
    )
    np.testing.assert_allclose(
        np.asarray(logits)[0], logits_ref, atol=2e-3,
        err_msg="high-level sub-goal logits diverge at production scale",
    )
    act, stop, _ = low.apply(
        low_vars, obs, low.initial_hidden(1), jnp.zeros((1, T, 2)), m,
        jnp.asarray(discrete)[None],
    )
    np.testing.assert_allclose(np.asarray(act)[0], act_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(stop)[0], stop_ref, atol=2e-3)
