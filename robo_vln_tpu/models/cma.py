"""Cross-Modal Attention (CMA) policy (flax).

Equivalent of reference CMANet
(/root/reference/robo_vln_baselines/models/cma.py:20-333):

  1st RNN over [rgb_lin ∥ depth_lin]          (cma.py:255-269)
  state->text scaled-dot attention            (cma.py:271-276)
  text->rgb / text->depth attention via 1x1-conv K/V (cma.py:280-289)
  2nd RNN over [state ∥ text ∥ rgb-att ∥ depth-att]  (cma.py:304-318)
  (velocity, stop) heads

TPU structure: the attentions are *not* recurrent — the reference computes
them batched over all T*B frames after materializing the first RNN's outputs
— so the sequence forward here is: encoders over T*B frames -> scan#1 ->
batched attentions -> scan#2.  The instruction is encoded ONCE per episode
and broadcast over time (the reference re-encodes identical copies per frame,
cma.py:227-228 — same math, wasted FLOPs we don't reproduce).

Hidden packing matches the reference: (4, B, H) = [scan#1 h,c ; scan#2 h,c].
Visual tokens are token-major (B, S, C); the reference's 1x1 convs are Dense
over C.  External sequence layout is batch-major (B, T, ...) so the (B*T)
conv-frame flatten keeps the data-sharded batch axis outermost; the small
feature tensors are transposed time-major only for the scans.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.models.encoders.instruction import InstructionEncoder
from robo_vln_tpu.models.encoders.visual import DepthEncoder, RGBEncoder
from robo_vln_tpu.models.rnn_state_encoder import RNNStateEncoder


def _attn_tokens(q, kv_k, kv_v, scale, mask=None):
    """Reference CMANet._attn (cma.py:201-209) on token-major (N, S, C)
    tensors: logits -= 1e8*mask, softmax(logits*scale)."""
    logits = jnp.einsum("nc,nsc->ns", q, kv_k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits - mask.astype(jnp.float32) * 1e8
    att = jax.nn.softmax(logits * scale, axis=1)
    return jnp.einsum("ns,nsc->nc", att.astype(kv_v.dtype), kv_v)


class CMAPolicy(nn.Module):
    model_config: Any
    num_actions: int = 2
    compute_dtype: Any = jnp.float32

    def setup(self):
        mc = self.model_config
        ic = mc.INSTRUCTION_ENCODER
        self.instruction_encoder = InstructionEncoder(
            vocab_size=ic.vocab_size,
            embedding_size=ic.embedding_size,
            hidden_size=ic.hidden_size,
            rnn_type=ic.rnn_type,
            final_state_only=False,  # forced by CMANet (cma.py:31-34)
            bidirectional=ic.bidirectional,
            use_pretrained_embeddings=ic.use_pretrained_embeddings,
            embedding_file=ic.embedding_file,
        )
        self.depth_encoder = DepthEncoder(
            output_size=mc.DEPTH_ENCODER.output_size, spatial_output=True,
            blocks=tuple(mc.DEPTH_ENCODER.blocks),
            compute_dtype=self.compute_dtype,
        )
        self.rgb_encoder = RGBEncoder(
            output_size=mc.RGB_ENCODER.output_size, spatial_output=True,
            blocks=tuple(mc.RGB_ENCODER.blocks),
            compute_dtype=self.compute_dtype,
        )
        H = mc.STATE_ENCODER.hidden_size
        self._H = H
        self._rcm = bool(mc.CMA.rcm_state_encoder)
        if self._rcm:
            # reference swaps the 1st RNN for the RCM recurrent-attention
            # encoder (cma.py:76-82); rgb/depth_linear are not built there
            from robo_vln_tpu.models.rcm import RCMStateEncoder

            self.state_encoder = RCMStateEncoder(
                hidden_size=H, rnn_type="GRU", name="state_encoder"
            )
        else:
            self.state_encoder = RNNStateEncoder(
                hidden_size=H, rnn_type=mc.STATE_ENCODER.rnn_type,
                name="state_encoder",
            )
            self.rgb_linear = nn.Dense(
                mc.RGB_ENCODER.output_size, name="rgb_linear"
            )
            self.depth_linear = nn.Dense(
                mc.DEPTH_ENCODER.output_size, name="depth_linear"
            )
        self.second_state_encoder = RNNStateEncoder(
            hidden_size=H, rnn_type=mc.STATE_ENCODER.rnn_type,
            name="second_state_encoder",
        )
        if mc.CMA.use_prev_action:
            self.prev_action_embedding = nn.Embed(self.num_actions + 1, 32)
        self.rgb_kv = nn.Dense(H // 2 + mc.RGB_ENCODER.output_size, name="rgb_kv")
        self.depth_kv = nn.Dense(H // 2 + mc.DEPTH_ENCODER.output_size, name="depth_kv")
        self.state_q = nn.Dense(H // 2, name="state_q")
        self.text_k = nn.Dense(H // 2, name="text_k")
        self.text_q = nn.Dense(H // 2, name="text_q")
        self.second_state_compress = nn.Dense(H, name="second_state_compress")
        self.progress_monitor = nn.Dense(1, name="progress_monitor")
        self.linear = nn.Dense(self.num_actions, name="linear")
        self.stop_linear = nn.Dense(1, name="stop_linear")

    @property
    def num_recurrent_layers(self):
        # non-RCM: two LSTM encoders packed [h1,c1,h2,c2];
        # RCM: GRU h (1) + last-output slot (1) + second LSTM (2) — also 4
        return 4

    def initial_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(
            (self.num_recurrent_layers, batch_size,
             self.model_config.STATE_ENCODER.hidden_size), jnp.float32,
        )

    def __call__(
        self,
        observations: Dict[str, jnp.ndarray],
        hidden: jnp.ndarray,  # (4, B, H)
        prev_actions: Optional[jnp.ndarray],
        masks: jnp.ndarray,  # (B, T) or (B,)
        deterministic: bool = True,  # no dropout in CMANet; uniform step API
    ):
        from robo_vln_tpu.models.encoders.visual import visual_obs, visual_ref

        mc = self.model_config
        single = visual_ref(observations).ndim == 4
        if single:
            observations = {
                k: (v[:, None] if k != "instruction" else v)
                for k, v in observations.items()
            }
            masks = masks[:, None]
            if prev_actions is not None:
                prev_actions = prev_actions[:, None]

        b, t = visual_ref(observations).shape[:2]
        n = b * t

        depth_tokens = self.depth_encoder(
            visual_obs(observations, "depth", n)
        )  # (N, 64, 96)
        rgb_tokens = self.rgb_encoder(visual_obs(observations, "rgb", n))  # (N, 16, 2112)

        # (B, C, L) channel-major from the encoder; broadcast over time
        ins_cl = self.instruction_encoder(observations["instruction"])
        text_mask_b = jnp.all(ins_cl == 0.0, axis=1)  # (B, L)
        ins_lc = jnp.swapaxes(ins_cl, 1, 2)  # (B, L, C)

        if mc.ablate_instruction:
            ins_lc = ins_lc * 0
        if mc.ablate_depth:
            depth_tokens = depth_tokens * 0
        if mc.ablate_rgb:
            rgb_tokens = rgb_tokens * 0

        masks_tm = jnp.swapaxes(masks, 0, 1)  # (T, B)
        if mc.CMA.use_prev_action:
            pa = ((prev_actions.astype(jnp.float32) + 1) * masks[..., None]).astype(
                jnp.int32
            )[..., 0].reshape(n)
            pa_emb = self.prev_action_embedding(pa)

        if self._rcm:
            # recurrent cross-modal attention over raw visual tokens
            # (reference cma.py:243-252); prev-action input is the embedding
            # when use_prev_action else the raw velocities
            if mc.CMA.use_prev_action:
                pa_in = pa_emb
            elif prev_actions is not None:
                pa_in = prev_actions.reshape(n, -1)
            else:  # None convention of the other policy paths: zero velocities
                pa_in = jnp.zeros((n, 2), jnp.float32)
            rgb_tm = jnp.swapaxes(rgb_tokens.reshape(b, t, *rgb_tokens.shape[1:]), 0, 1)
            depth_tm = jnp.swapaxes(
                depth_tokens.reshape(b, t, *depth_tokens.shape[1:]), 0, 1
            )
            pa_tm = jnp.swapaxes(pa_in.reshape(b, t, -1), 0, 1)
            state_seq, hid1 = self.state_encoder(
                rgb_tm, depth_tm, pa_tm, hidden[0:2], masks_tm
            )
            state = jnp.swapaxes(state_seq, 0, 1).reshape(n, -1)
        else:
            rgb_in = nn.relu(self.rgb_linear(jnp.mean(rgb_tokens, axis=1)))
            depth_flat = jnp.swapaxes(depth_tokens, 1, 2).reshape(n, -1)  # (N, C*S)
            depth_in = nn.relu(self.depth_linear(depth_flat))
            if mc.CMA.use_prev_action:
                state_in = jnp.concatenate(
                    [rgb_in, depth_in, pa_emb], axis=1
                ).reshape(b, t, -1)
            else:
                state_in = jnp.concatenate(
                    [rgb_in, depth_in], axis=1
                ).reshape(b, t, -1)
            state_seq, hid1 = self.state_encoder(
                jnp.swapaxes(state_in, 0, 1), hidden[0:2], masks_tm
            )
            state = jnp.swapaxes(state_seq, 0, 1).reshape(n, -1)

        scale = 1.0 / jnp.sqrt(jnp.asarray(self._H // 2, jnp.float32))
        ins_tb = jnp.broadcast_to(
            ins_lc[:, None], (b, t) + ins_lc.shape[1:]
        ).reshape(n, *ins_lc.shape[1:])  # (N, L, C)
        text_mask = jnp.broadcast_to(
            text_mask_b[:, None], (b, t) + text_mask_b.shape[1:]
        ).reshape(n, -1)

        text_state_q = self.state_q(state)
        text_state_k = self.text_k(ins_tb)  # (N, L, H/2)
        text_embedding = _attn_tokens(
            text_state_q, text_state_k, ins_tb, scale, text_mask
        )  # (N, C_ins)

        rgb_kv = self.rgb_kv(rgb_tokens)
        rgb_k, rgb_v = rgb_kv[..., : self._H // 2], rgb_kv[..., self._H // 2 :]
        depth_kv = self.depth_kv(depth_tokens)
        depth_k, depth_v = depth_kv[..., : self._H // 2], depth_kv[..., self._H // 2 :]

        text_q = self.text_q(text_embedding)
        rgb_att = _attn_tokens(text_q, rgb_k, rgb_v, scale)
        depth_att = _attn_tokens(text_q, depth_k, depth_v, scale)

        if mc.CMA.use_prev_action:
            x = jnp.concatenate(
                [state, text_embedding, rgb_att, depth_att, pa_emb], axis=1
            )
        else:
            x = jnp.concatenate([state, text_embedding, rgb_att, depth_att], axis=1)
        x = nn.relu(self.second_state_compress(x)).reshape(b, t, -1)
        out_seq, hid2 = self.second_state_encoder(
            jnp.swapaxes(x, 0, 1), hidden[2:4], masks_tm
        )
        out = jnp.swapaxes(out_seq, 0, 1)  # (B, T, H)

        hidden = jnp.concatenate([hid1, hid2], axis=0)

        aux = {}
        if mc.PROGRESS_MONITOR.use:
            aux["progress_hat"] = jnp.tanh(self.progress_monitor(out))[..., 0]

        actions = self.linear(out)
        stop = self.stop_linear(out)
        if single:
            return actions[:, 0], stop[:, 0], hidden, aux
        return actions, stop, hidden, aux
