"""Hierarchical Cross-Modal (HCM) agent: high-level sub-goal + low-level
velocity policies (flax).

Equivalents of the reference pair
(/root/reference/robo_vln_baselines/models/seq2seq_highlevel_cma.py:29-233 and
seq2seq_lowlevel.py:21-162).  The reference spreads the two modules over two
GPUs with an explicit device-to-device observation copy per step
(hierarchical_trainer.py:517-521); here both are flax modules jitted into ONE
XLA program by the trainer — no transfer exists on TPU (SURVEY.md §2.6).

High level (HighLevelPolicy):
  frozen BERT instruction embedding (no attention mask — reference quirk)
  spatial RGB (2112ch x 16 tokens) / depth (96ch x 64 tokens) features
  rgb_kv/depth_kv 1x1 conv -> shared VisualLingAttn (instruction queries x
  visual KV; the SAME module instance attends rgb and depth,
  seq2seq_highlevel_cma.py:200-201) -> mean-pool
  ∥ rgb_linear ∥ depth_linear -> LSTM(512) -> 4-way sub-goal logits.

Low level (LowLevelPolicy):
  depth ∥ rgb vector embeddings ∥ sub-task embedding (Embed(5, 32), index 4 =
  padding with zero vector, seq2seq_lowlevel.py:76) -> LSTM(512) ->
  (velocity(2), stop(1)).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.models.encoders.bert import BertEncoder
from robo_vln_tpu.models.encoders.visual import (
    DepthEncoder,
    RGBEncoder,
    visual_obs as _visual_obs,
    visual_ref as _visual_ref,
)
from robo_vln_tpu.models.rnn_state_encoder import RNNStateEncoder
from robo_vln_tpu.models.transformer import VisualLingAttn


class HighLevelPolicy(nn.Module):
    model_config: Any
    num_actions: int = 4
    compute_dtype: Any = jnp.float32

    def setup(self):
        mc = self.model_config
        bc = mc.BERT
        self.embedding_layer = BertEncoder(
            vocab_size=bc.vocab_size,
            hidden_size=bc.hidden_size,
            num_layers=bc.num_layers,
            num_heads=bc.num_heads,
            intermediate_size=bc.intermediate_size,
            max_position_embeddings=bc.max_position_embeddings,
            compute_dtype=self.compute_dtype,
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
        va = mc.VISUAL_LING_ATTN
        self.rgb_kv = nn.Dense(va.vis_in_features, name="rgb_kv")
        self.depth_kv = nn.Dense(va.vis_in_features, name="depth_kv")
        self.image_cm_encoder = VisualLingAttn(
            d_model=va.d_model,
            h=va.h,
            d_ff=va.d_ff,
            n_layers=va.N,
            vis_in_features=va.vis_in_features,
            ins_in_features=va.ins_in_features,
            dropout=va.dropout,
            compute_dtype=self.compute_dtype,
        )
        self.rgb_linear = nn.Dense(mc.RGB_ENCODER.output_size, name="rgb_linear")
        self.depth_linear = nn.Dense(mc.DEPTH_ENCODER.output_size, name="depth_linear")
        self.state_encoder = RNNStateEncoder(
            hidden_size=mc.STATE_ENCODER.hidden_size,
            rnn_type=mc.STATE_ENCODER.rnn_type,
        )
        self.progress_monitor = nn.Dense(1, name="progress_monitor")
        self.linear = nn.Dense(self.num_actions, name="linear")
        self._H = mc.STATE_ENCODER.hidden_size

    @property
    def num_recurrent_layers(self):
        return self.state_encoder.num_recurrent_layers

    def initial_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((2, batch_size, self.model_config.STATE_ENCODER.hidden_size), jnp.float32)

    def embed_instruction(self, instruction: jnp.ndarray) -> jnp.ndarray:
        """Frozen BERT over the token ids -> (B, L, H).  The instruction is
        EPISODE-constant, so the eval driver computes this once per episode
        and feeds it back as observations["instruction_embedding"] — the
        reference reruns BERT every control tick (robo_vln baseline
        seq2seq_highlevel_cma.py:192-196).

        MODEL.BERT.trainable=True (PARITY.md deviation) drops the
        stop_gradient so the instruction pathway trains end-to-end."""
        embedded = self.embedding_layer(instruction)
        if getattr(self.model_config.BERT, "trainable", False):
            return embedded
        return jax.lax.stop_gradient(embedded)

    def __call__(
        self,
        observations: Dict[str, jnp.ndarray],
        hidden: jnp.ndarray,
        prev_actions: Optional[jnp.ndarray],
        masks: jnp.ndarray,  # (B, T) or (B,)
        deterministic: bool = True,
    ):
        mc = self.model_config
        single = _visual_ref(observations).ndim == 4
        if single:
            observations = {
                k: (v[:, None]
                    if k not in ("instruction", "instruction_embedding")
                    else v)
                for k, v in observations.items()
            }
            masks = masks[:, None]

        b, t = _visual_ref(observations).shape[:2]
        n = b * t

        depth_tokens = self.depth_encoder(_visual_obs(observations, "depth", n))
        rgb_tokens = self.rgb_encoder(_visual_obs(observations, "rgb", n))
        if mc.ablate_depth:
            depth_tokens = depth_tokens * 0
        if mc.ablate_rgb:
            rgb_tokens = rgb_tokens * 0

        # Frozen BERT over the (episode-constant) instruction — once per
        # window, or skipped entirely when the eval driver or the feature
        # store (training/featurize.py, f16) supplies the per-episode
        # cached embedding
        if "instruction_embedding" in observations:
            embedded_b = observations["instruction_embedding"].astype(
                self.compute_dtype
            )  # (B, L, 768)
        else:
            embedded_b = self.embed_instruction(observations["instruction"])

        rgb_spatial = self.rgb_kv(rgb_tokens)  # (N, 16, 256)
        depth_spatial = self.depth_kv(depth_tokens)  # (N, 64, 256)

        embedded = jnp.broadcast_to(
            embedded_b[:, None], (b, t) + embedded_b.shape[1:]
        ).reshape(n, *embedded_b.shape[1:])

        ins_rgb_att = self.image_cm_encoder(
            embedded, rgb_spatial, deterministic=deterministic
        )  # (N, L, 256)
        ins_depth_att = self.image_cm_encoder(
            embedded, depth_spatial, deterministic=deterministic
        )

        # cross_pooler: mean over the token axis (seq2seq_highlevel_cma.py:114-115)
        ins_rgb_att = jnp.mean(ins_rgb_att, axis=1)
        ins_depth_att = jnp.mean(ins_depth_att, axis=1)

        rgb_in = nn.relu(self.rgb_linear(jnp.mean(rgb_tokens, axis=1)))
        depth_flat = jnp.swapaxes(depth_tokens, 1, 2).reshape(n, -1)
        depth_in = nn.relu(self.depth_linear(depth_flat))

        x = jnp.concatenate(
            [rgb_in, depth_in, ins_rgb_att, ins_depth_att], axis=1
        ).reshape(b, t, -1)
        out, hidden = self.state_encoder(
            jnp.swapaxes(x, 0, 1), hidden, jnp.swapaxes(masks, 0, 1)
        )
        out = jnp.swapaxes(out, 0, 1)  # (B, T, H)

        logits = self.linear(out)
        if single:
            return logits[:, 0], hidden
        return logits, hidden


class LowLevelPolicy(nn.Module):
    model_config: Any
    num_actions: int = 2
    num_sub_tasks: int = 4
    compute_dtype: Any = jnp.float32

    def setup(self):
        mc = self.model_config
        self.depth_encoder = DepthEncoder(
            output_size=mc.DEPTH_ENCODER.output_size,
            blocks=tuple(mc.DEPTH_ENCODER.blocks),
            compute_dtype=self.compute_dtype,
        )
        self.rgb_encoder = RGBEncoder(
            output_size=mc.RGB_ENCODER.output_size,
            blocks=tuple(mc.RGB_ENCODER.blocks),
            compute_dtype=self.compute_dtype,
        )
        self.sub_task_embedding = nn.Embed(
            self.num_sub_tasks + 1, 32, name="sub_task_embedding"
        )
        self.state_encoder = RNNStateEncoder(
            hidden_size=mc.STATE_ENCODER.hidden_size,
            rnn_type=mc.STATE_ENCODER.rnn_type,
        )
        self.progress_monitor = nn.Dense(1, name="progress_monitor")
        self.linear = nn.Dense(self.num_actions, name="linear")
        self.stop_linear = nn.Dense(1, name="stop_linear")
        self._H = mc.STATE_ENCODER.hidden_size

    @property
    def num_recurrent_layers(self):
        return self.state_encoder.num_recurrent_layers

    def initial_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros((2, batch_size, self.model_config.STATE_ENCODER.hidden_size), jnp.float32)

    def __call__(
        self,
        observations: Dict[str, jnp.ndarray],
        hidden: jnp.ndarray,
        prev_actions: Optional[jnp.ndarray],
        masks: jnp.ndarray,
        discrete_actions: jnp.ndarray,  # (B, T) or (B,) sub-task ids, 4 = pad
        deterministic: bool = True,  # no dropout in the low level; uniform API
    ):
        mc = self.model_config
        single = _visual_ref(observations).ndim == 4
        if single:
            observations = {
                k: (v[:, None]
                    if k not in ("instruction", "instruction_embedding")
                    else v)
                for k, v in observations.items()
            }
            masks = masks[:, None]
            discrete_actions = discrete_actions[:, None]

        b, t = _visual_ref(observations).shape[:2]
        n = b * t

        depth_embedding = self.depth_encoder(
            _visual_obs(observations, "depth", n)
        )
        rgb_embedding = self.rgb_encoder(_visual_obs(observations, "rgb", n))
        if mc.ablate_depth:
            depth_embedding = depth_embedding * 0
        if mc.ablate_rgb:
            rgb_embedding = rgb_embedding * 0

        ids = discrete_actions.reshape(n).astype(jnp.int32)
        sub = self.sub_task_embedding(ids)
        # padding_idx=4 -> zero vector (torch nn.Embedding(padding_idx) semantics)
        sub = jnp.where((ids == self.num_sub_tasks)[:, None], 0.0, sub)

        x = jnp.concatenate(
            [depth_embedding, rgb_embedding, sub], axis=1
        ).reshape(b, t, -1)
        out, hidden = self.state_encoder(
            jnp.swapaxes(x, 0, 1), hidden, jnp.swapaxes(masks, 0, 1)
        )
        out = jnp.swapaxes(out, 0, 1)

        actions = self.linear(out)
        stop = self.stop_linear(out)
        if single:
            return actions[:, 0], stop[:, 0], hidden
        return actions, stop, hidden
