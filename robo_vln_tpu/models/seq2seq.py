"""Seq2Seq flat baseline policy (flax).

Equivalent of reference Seq2SeqNet
(/root/reference/robo_vln_baselines/models/seq2seq.py:21-189): instruction
final-state embedding ∥ depth embedding ∥ rgb embedding -> masked LSTM ->
(velocity(2), stop(1)) heads + optional progress-monitor aux head.

TPU-native layout: the policy consumes batch-major sequences (B, T, ...) — so
the (B*T)-frame flatten feeding the conv encoders keeps the data-sharded batch
axis outermost (no cross-device regrouping under GSPMD); the small
post-encoder features are transposed time-major for the lax.scan.  A (B, ...)
input is treated as a single step (eval rollout path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.models.encoders.instruction import InstructionEncoder
from robo_vln_tpu.models.encoders.visual import (
    DepthEncoder,
    RGBEncoder,
    SimpleCNN,
)
from robo_vln_tpu.models.rnn_state_encoder import RNNStateEncoder


class Seq2SeqPolicy(nn.Module):
    model_config: Any  # MODEL config tree
    num_actions: int = 2
    num_sub_tasks: int = 4
    compute_dtype: Any = jnp.float32  # bf16 on TPU (TPU.PRECISION)

    def setup(self):
        mc = self.model_config
        ic = mc.INSTRUCTION_ENCODER
        if ic.is_bert:
            # BERT-embedding LanguageEncoder path (seq2seq.py:45-46)
            from robo_vln_tpu.models.encoders.language import LanguageEncoder

            self._uses_language_encoder = True
            self.instruction_encoder = LanguageEncoder(
                dropout_ratio=mc.INSTRUCTION_ENCODER.dropout_ratio,
                bert_config=mc.BERT,
                hidden_size=ic.hidden_size,
                rnn_type=ic.rnn_type,
                final_state_only=True,
                bidirectional=ic.bidirectional,
                compute_dtype=self.compute_dtype,
            )
        else:
            self._uses_language_encoder = False
            self.instruction_encoder = InstructionEncoder(
                vocab_size=ic.vocab_size,
                embedding_size=ic.embedding_size,
                hidden_size=ic.hidden_size,
                rnn_type=ic.rnn_type,
                final_state_only=True,
                bidirectional=ic.bidirectional,
                use_pretrained_embeddings=ic.use_pretrained_embeddings,
                embedding_file=ic.embedding_file,
            )
        if mc.DEPTH_ENCODER.cnn_type == "SimpleDepthCNN":
            self.depth_encoder = SimpleCNN(
                mc.DEPTH_ENCODER.output_size, "depth",
                compute_dtype=self.compute_dtype,
            )
        else:
            self.depth_encoder = DepthEncoder(
                output_size=mc.DEPTH_ENCODER.output_size,
                blocks=tuple(mc.DEPTH_ENCODER.blocks),
                compute_dtype=self.compute_dtype,
            )
        if mc.RGB_ENCODER.cnn_type == "SimpleRGBCNN":
            self.rgb_encoder = SimpleCNN(
                mc.RGB_ENCODER.output_size, "rgb",
                compute_dtype=self.compute_dtype,
            )
        else:
            self.rgb_encoder = RGBEncoder(
                output_size=mc.RGB_ENCODER.output_size,
                blocks=tuple(mc.RGB_ENCODER.blocks),
                compute_dtype=self.compute_dtype,
            )
        self.state_encoder = RNNStateEncoder(
            hidden_size=mc.STATE_ENCODER.hidden_size,
            rnn_type=mc.STATE_ENCODER.rnn_type,
        )
        if mc.SEQ2SEQ.use_prev_action:
            self.prev_action_embedding = nn.Embed(self.num_actions + 1, 32)
        self.progress_monitor = nn.Dense(
            1, kernel_init=nn.initializers.kaiming_normal(), name="progress_monitor"
        )
        self.linear = nn.Dense(self.num_actions, name="linear")
        self.stop_linear = nn.Dense(1, name="stop_linear")
        self.sub_goal_linear = nn.Dense(self.num_sub_tasks, name="sub_goal_linear")

    @property
    def num_recurrent_layers(self):
        return self.state_encoder.num_recurrent_layers

    def initial_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(
            (
                2 if self.model_config.STATE_ENCODER.rnn_type == "LSTM" else 1,
                batch_size,
                self.model_config.STATE_ENCODER.hidden_size,
            ),
            jnp.float32,
        )

    def __call__(
        self,
        observations: Dict[str, jnp.ndarray],
        hidden: jnp.ndarray,  # (layers, B, H)
        prev_actions: Optional[jnp.ndarray],  # (B, T, 2) or (B, 2)
        masks: jnp.ndarray,  # (B, T) or (B,) not-done masks
        deterministic: bool = True,
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

        if self._uses_language_encoder:
            instruction_embedding = self.instruction_encoder(
                observations["instruction"], deterministic=deterministic
            )  # (B, Hi)
        else:
            instruction_embedding = self.instruction_encoder(
                observations["instruction"]
            )  # (B, Hi)
        depth_embedding = self.depth_encoder(visual_obs(observations, "depth", n))
        rgb_embedding = self.rgb_encoder(visual_obs(observations, "rgb", n))

        if mc.ablate_instruction:
            instruction_embedding = instruction_embedding * 0
        if mc.ablate_depth:
            depth_embedding = depth_embedding * 0
        if mc.ablate_rgb:
            rgb_embedding = rgb_embedding * 0

        ins = jnp.broadcast_to(
            instruction_embedding[:, None],
            (b, t) + instruction_embedding.shape[1:],
        )  # (B, T, Hi)
        x = jnp.concatenate(
            [
                ins,
                depth_embedding.reshape(b, t, -1),
                rgb_embedding.reshape(b, t, -1),
            ],
            axis=-1,
        )
        if mc.SEQ2SEQ.use_prev_action:
            pa = ((prev_actions.astype(jnp.float32) + 1) * masks[..., None]).astype(
                jnp.int32
            )[..., 0]
            x = jnp.concatenate([x, self.prev_action_embedding(pa)], axis=-1)

        out_tm, hidden = self.state_encoder(
            jnp.swapaxes(x, 0, 1), hidden, jnp.swapaxes(masks, 0, 1)
        )  # (T, B, H)
        out = jnp.swapaxes(out_tm, 0, 1)  # (B, T, H)

        aux = {}
        if mc.PROGRESS_MONITOR.use:
            aux["progress_hat"] = jnp.tanh(self.progress_monitor(out))[..., 0]

        actions = self.linear(out)
        stop = self.stop_linear(out)
        if single:
            return actions[:, 0], stop[:, 0], hidden, aux
        return actions, stop, hidden, aux
