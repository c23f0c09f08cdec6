"""Golden tests: masked RNN scan vs torch cuDNN-semantics reference.

The torch side re-implements the *behavior* of the reference RNNStateEncoder
(state_encoder.py:83-133): split the sequence at steps where any mask is zero,
multiply the carried hidden by that step's mask, run nn.LSTM per segment.
Our lax.scan must match to float tolerance.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from robo_vln_tpu.models.rnn_state_encoder import RNNStateEncoder


def torch_masked_rnn(rnn, x, h0, masks):
    """x (T,B,D), masks (T,B). Mimics reference seq_forward segment splitting."""
    t = x.shape[0]
    has_zeros = (masks[1:] == 0.0).any(dim=-1).nonzero().squeeze(-1)
    has_zeros = (has_zeros + 1).tolist()
    boundaries = [0] + has_zeros + [t]
    hidden = h0
    outs = []
    for i in range(len(boundaries) - 1):
        s, e = boundaries[i], boundaries[i + 1]
        m = masks[s].view(1, -1, 1)
        if isinstance(hidden, tuple):
            hidden = tuple(v * m for v in hidden)
        else:
            hidden = hidden * m
        y, hidden = rnn(x[s:e], hidden)
        outs.append(y)
    return torch.cat(outs, dim=0), hidden


def port_lstm_weights(rnn):
    return dict(
        w_ih=jnp.asarray(rnn.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(rnn.weight_hh_l0.detach().numpy().T),
        b_ih=jnp.asarray(rnn.bias_ih_l0.detach().numpy()),
        b_hh=jnp.asarray(rnn.bias_hh_l0.detach().numpy()),
    )


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_masked_seq_matches_torch(rnn_type, rng):
    T, B, D, H = 12, 3, 16, 24
    torch.manual_seed(0)
    rnn = getattr(torch.nn, rnn_type)(D, H)

    x = rng.standard_normal((T, B, D)).astype(np.float32)
    masks = np.ones((T, B), np.float32)
    masks[0] = 0.0  # collate_fn sets not_done[0]=0 (robo_vln_trainer.py:141-142)
    masks[5, 1] = 0.0  # mid-sequence episode reset
    masks[9, :] = 0.0

    if rnn_type == "LSTM":
        h0 = (torch.zeros(1, B, H), torch.zeros(1, B, H))
    else:
        h0 = torch.zeros(1, B, H)
    with torch.no_grad():
        y_ref, hid_ref = torch_masked_rnn(
            rnn, torch.from_numpy(x), h0, torch.from_numpy(masks)
        )

    enc = RNNStateEncoder(hidden_size=H, rnn_type=rnn_type)
    params = {"params": port_lstm_weights(rnn)}
    hidden0 = enc.initial_hidden(B)
    y, hidden = enc.apply(params, jnp.asarray(x), hidden0, jnp.asarray(masks))

    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-5)
    if rnn_type == "LSTM":
        np.testing.assert_allclose(np.asarray(hidden[0]), hid_ref[0][0].numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hidden[1]), hid_ref[1][0].numpy(), atol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(hidden[0]), hid_ref[0].numpy(), atol=1e-5)


def test_single_step_matches_seq(rng):
    """single_forward == one-step seq_forward (state_encoder.py:72-81)."""
    B, D, H = 4, 8, 16
    import jax

    enc = RNNStateEncoder(hidden_size=H, rnn_type="LSTM")
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x, enc.initial_hidden(B), jnp.ones((B,)))
    h = jnp.asarray(rng.standard_normal((2, B, H)).astype(np.float32))
    mask = jnp.asarray([1.0, 0.0, 1.0, 1.0])

    y1, h1 = enc.apply(params, x, h, mask)
    y2, h2 = enc.apply(params, x[None], h, mask[None])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_packed_sequence_semantics(rng):
    """length_masked_lstm == torch pack_padded_sequence path
    (instruction_encoder.py:83-92)."""
    from robo_vln_tpu.ops.rnn import length_masked_lstm

    B, L, D, H = 3, 10, 8, 12
    torch.manual_seed(1)
    rnn = torch.nn.LSTM(D, H, batch_first=True)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([10, 4, 7])

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True,
        enforce_sorted=False,
    )
    with torch.no_grad():
        out_p, (h_p, c_p) = rnn(packed)
    out_ref = torch.nn.utils.rnn.pad_packed_sequence(
        out_p, batch_first=True, total_length=L
    )[0].numpy()

    w = port_lstm_weights(rnn)
    outs, (hT, cT) = length_masked_lstm(
        jnp.asarray(x), jnp.asarray(lengths), w["w_ih"], w["w_hh"],
        w["b_ih"] + w["b_hh"],
    )
    np.testing.assert_allclose(np.asarray(outs), out_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), h_p[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), c_p[0].numpy(), atol=1e-5)


def test_bidirectional_packed(rng):
    """Forward+reverse passes == torch bidirectional packed LSTM."""
    from robo_vln_tpu.ops.rnn import length_masked_lstm

    B, L, D, H = 2, 8, 6, 10
    torch.manual_seed(2)
    rnn = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([8, 5])

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True,
        enforce_sorted=False,
    )
    with torch.no_grad():
        out_p, (h_p, _) = rnn(packed)
    out_ref = torch.nn.utils.rnn.pad_packed_sequence(
        out_p, batch_first=True, total_length=L
    )[0].numpy()

    fwd = dict(
        w_ih=jnp.asarray(rnn.weight_ih_l0.detach().numpy().T),
        w_hh=jnp.asarray(rnn.weight_hh_l0.detach().numpy().T),
        b=jnp.asarray((rnn.bias_ih_l0 + rnn.bias_hh_l0).detach().numpy()),
    )
    bwd = dict(
        w_ih=jnp.asarray(rnn.weight_ih_l0_reverse.detach().numpy().T),
        w_hh=jnp.asarray(rnn.weight_hh_l0_reverse.detach().numpy().T),
        b=jnp.asarray((rnn.bias_ih_l0_reverse + rnn.bias_hh_l0_reverse).detach().numpy()),
    )
    lengths_j = jnp.asarray(lengths)
    xj = jnp.asarray(x)
    out_f, (hf, _) = length_masked_lstm(xj, lengths_j, fwd["w_ih"], fwd["w_hh"], fwd["b"])
    out_b, (hb, _) = length_masked_lstm(
        xj, lengths_j, bwd["w_ih"], bwd["w_hh"], bwd["b"], reverse=True
    )
    out = np.concatenate([np.asarray(out_f), np.asarray(out_b)], axis=-1)
    np.testing.assert_allclose(out, out_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), h_p[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hb), h_p[1].numpy(), atol=1e-5)
