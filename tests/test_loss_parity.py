"""End-to-end loss parity: the flat IL step's losses vs a torch
reconstruction of the reference pipeline (Seq2SeqNet forward +
_update_agent losses, robo_vln_trainer.py:505-542) with identical weights
and data.  Batch 1 — the reference's instruction `expand` only supports
B=1, which is what every paper config uses."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from robo_vln_tpu.ops import losses as L


class TorchSeq2Seq(tnn.Module):
    """Reference-semantics flat policy at test scale: GloVe-style embedding ->
    LSTM final state; NatureCNN rgb/depth; LSTM state encoder; (2, 1) heads."""

    def __init__(self, V=40, E=8, HI=12, OUT_D=8, OUT_R=16, H=24):
        super().__init__()
        self.emb = tnn.Embedding(V, E, padding_idx=0)
        self.ins_rnn = tnn.LSTM(E, HI, batch_first=True)
        def cnn(cin, out):
            return tnn.Sequential(
                tnn.Conv2d(cin, 32, 8, 4), tnn.ReLU(True),
                tnn.Conv2d(32, 64, 4, 2), tnn.ReLU(True),
                tnn.Conv2d(64, 32, 3, 1), tnn.Flatten(),
                tnn.Linear(32 * 4 * 4, out), tnn.ReLU(True),
            )
        self.depth_cnn = cnn(1, OUT_D)
        self.rgb_cnn = cnn(3, OUT_R)
        self.state_rnn = tnn.LSTM(HI + OUT_D + OUT_R, H)
        self.linear = tnn.Linear(H, 2)
        self.stop_linear = tnn.Linear(H, 1)

    def forward(self, instruction, rgb, depth, masks):
        # instruction (1, L); rgb (T, 64, 64, 3); depth (T, 64, 64, 1); masks (T,)
        T = rgb.shape[0]
        lengths = (instruction != 0).long().sum(1)
        packed = tnn.utils.rnn.pack_padded_sequence(
            self.emb(instruction), lengths, batch_first=True, enforce_sorted=False
        )
        _, (h, _) = self.ins_rnn(packed)
        ins = h[0].expand(T, -1)  # (T, HI) — valid only for B=1
        d = self.depth_cnn(depth.permute(0, 3, 1, 2))
        r = self.rgb_cnn(rgb.permute(0, 3, 1, 2) / 255.0)
        x = torch.cat([ins, d, r], dim=1)

        # reference RNNStateEncoder.seq_forward segment splitting
        from tests.test_rnn import torch_masked_rnn

        h0 = (torch.zeros(1, 1, 24), torch.zeros(1, 1, 24))
        y, _ = torch_masked_rnn(
            self.state_rnn, x.unsqueeze(1), h0, masks.unsqueeze(1)
        )
        y = y[:, 0]
        return self.linear(y), self.stop_linear(y)


def port_to_flax(tm: TorchSeq2Seq):
    from robo_vln_tpu.utils import weight_port as wp

    sd = wp.to_numpy_state_dict(tm.state_dict())

    def cnn_params(prefix, out):
        w_fc = sd[f"{prefix}.6.weight"].reshape(out, 32, 4, 4)
        w_fc = w_fc.transpose(0, 2, 3, 1).reshape(out, -1)
        return {
            "conv1": {"kernel": sd[f"{prefix}.0.weight"].transpose(2, 3, 1, 0),
                      "bias": sd[f"{prefix}.0.bias"]},
            "conv2": {"kernel": sd[f"{prefix}.2.weight"].transpose(2, 3, 1, 0),
                      "bias": sd[f"{prefix}.2.bias"]},
            "conv3": {"kernel": sd[f"{prefix}.4.weight"].transpose(2, 3, 1, 0),
                      "bias": sd[f"{prefix}.4.bias"]},
            "fc": {"kernel": w_fc.T, "bias": sd[f"{prefix}.6.bias"]},
        }

    return {
        "instruction_encoder": {
            "embedding": sd["emb.weight"],
            "fwd": wp.port_torch_rnn(sd, "ins_rnn."),
        },
        "depth_encoder": cnn_params("depth_cnn", 8),
        "rgb_encoder": cnn_params("rgb_cnn", 16),
        "state_encoder": wp.port_torch_rnn(sd, "state_rnn."),
        "linear": wp.port_linear(sd, "linear."),
        "stop_linear": wp.port_linear(sd, "stop_linear."),
    }


def test_flat_loss_parity(rng):
    torch.manual_seed(0)
    tm = TorchSeq2Seq().eval()

    T, B, Lq = 6, 1, 8
    instruction = rng.integers(1, 40, (B, Lq))
    instruction[0, 6:] = 0
    rgb = rng.integers(0, 255, (T, 64, 64, 3)).astype(np.float32)
    depth = rng.random((T, 64, 64, 1)).astype(np.float32)
    masks = np.ones(T, np.float32)
    masks[0] = 0.0
    corrected = rng.standard_normal((T, 2)).astype(np.float32)
    corrected[4:] = 0.0  # padding
    oracle_stop = np.full((T, 1), -1.0, np.float32)
    oracle_stop[:4, 0] = (rng.random(4) > 0.5).astype(np.float32)

    # ---- torch reference losses (_update_agent, :505-542)
    with torch.no_grad():
        out, stop = tm(
            torch.from_numpy(instruction), torch.from_numpy(rgb),
            torch.from_numpy(depth), torch.from_numpy(masks),
        )
        ct = torch.from_numpy(corrected)
        out = out.masked_fill(ct == 0, 0)
        action_loss_ref = tnn.MSELoss()(out, ct).item()
        ost = torch.from_numpy(oracle_stop)
        sel = ost != -1
        stop_loss_ref = tnn.BCEWithLogitsLoss()(
            torch.masked_select(stop, sel), torch.masked_select(ost, sel)
        ).item()

    # ---- flax policy with ported weights
    from tests.test_policies import tiny_model_config
    from robo_vln_tpu.models.seq2seq import Seq2SeqPolicy
    from robo_vln_tpu.training.steps import _flat_losses

    mc = tiny_model_config()
    mc.DEPTH_ENCODER.cnn_type = "SimpleDepthCNN"
    mc.RGB_ENCODER.cnn_type = "SimpleRGBCNN"
    mc.DEPTH_ENCODER.output_size = 8
    mc.RGB_ENCODER.output_size = 16
    mc.INSTRUCTION_ENCODER.vocab_size = 40
    mc.INSTRUCTION_ENCODER.embedding_size = 8
    mc.INSTRUCTION_ENCODER.hidden_size = 12
    mc.STATE_ENCODER.hidden_size = 24
    policy = Seq2SeqPolicy(model_config=mc)
    params = {"params": port_to_flax(tm)}

    batch = {
        "rgb": jnp.asarray(rgb)[None],  # (B=1, T, ...)
        "depth": jnp.asarray(depth)[None],
        "instruction": jnp.asarray(instruction),
        "progress": jnp.zeros((1, T)),
        "prev_actions": jnp.zeros((1, T, 2)),
        "corrected_actions": jnp.asarray(corrected)[None],
        "oracle_stop": jnp.asarray(oracle_stop)[None],
        "not_done_masks": jnp.asarray(masks)[None],
        "valid_mask": jnp.ones((1, T)),
    }

    class _P:
        def apply(self, v, *a, **k):
            return policy.apply(v, *a, **k)

    hidden = policy.initial_hidden(1)
    a, s, x, _ = _flat_losses(
        _P(), params["params"], batch, hidden,
        progress_alpha=1.0, use_progress=False,
    )
    np.testing.assert_allclose(float(a), action_loss_ref, rtol=2e-4)
    np.testing.assert_allclose(float(s), stop_loss_ref, rtol=2e-4)
    assert float(x) == 0.0
