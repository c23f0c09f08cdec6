"""Non-CMA high-level variant (flax).

Equivalent of reference Seq2Seq_HighLevel (seq2seq_highlevel.py:21-186): the
HCM high-level module WITHOUT the cross-modal transformer — instruction
embedding (LanguageEncoder when is_bert else InstructionEncoder) ∥ depth ∥ rgb
vector embeddings -> LSTM(512) -> discrete sub-goal logits (no stop head).
The shipped hierarchical trainer imports the CMA variant
(hierarchical_trainer.py:50); this one exists for the ablation surface.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from robo_vln_tpu.models.encoders.instruction import InstructionEncoder
from robo_vln_tpu.models.encoders.language import LanguageEncoder
from robo_vln_tpu.models.encoders.visual import DepthEncoder, RGBEncoder
from robo_vln_tpu.models.rnn_state_encoder import RNNStateEncoder


class HighLevelSeq2SeqPolicy(nn.Module):
    model_config: Any
    num_actions: int = 4
    compute_dtype: Any = jnp.float32

    def setup(self):
        mc = self.model_config
        ic = mc.INSTRUCTION_ENCODER
        if ic.is_bert:
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
        self.state_encoder = RNNStateEncoder(
            hidden_size=mc.STATE_ENCODER.hidden_size,
            rnn_type=mc.STATE_ENCODER.rnn_type,
        )
        self.linear = nn.Dense(self.num_actions, name="linear")

    @property
    def num_recurrent_layers(self):
        return self.state_encoder.num_recurrent_layers

    def initial_hidden(self, batch_size: int) -> jnp.ndarray:
        return jnp.zeros(
            (2, batch_size, self.model_config.STATE_ENCODER.hidden_size),
            jnp.float32,
        )

    def __call__(self, observations: Dict[str, jnp.ndarray], hidden,
                 prev_actions, masks, deterministic: bool = True):
        mc = self.model_config
        single = observations["rgb"].ndim == 4
        if single:
            observations = {
                k: (v[:, None] if k != "instruction" else v)
                for k, v in observations.items()
            }
            masks = masks[:, None]

        b, t = observations["rgb"].shape[:2]
        n = b * t
        rgb = observations["rgb"].reshape((n,) + observations["rgb"].shape[2:])
        depth = observations["depth"].reshape((n,) + observations["depth"].shape[2:])

        if self._uses_language_encoder:
            ins = self.instruction_encoder(
                observations["instruction"], deterministic=deterministic
            )  # (B, Hi)
        else:
            ins = self.instruction_encoder(observations["instruction"])
        depth_emb = self.depth_encoder({"depth": depth})
        rgb_emb = self.rgb_encoder({"rgb": rgb})
        if mc.ablate_instruction:
            ins = ins * 0
        if mc.ablate_depth:
            depth_emb = depth_emb * 0
        if mc.ablate_rgb:
            rgb_emb = rgb_emb * 0

        ins_bt = jnp.broadcast_to(ins[:, None], (b, t) + ins.shape[1:])
        x = jnp.concatenate(
            [ins_bt, depth_emb.reshape(b, t, -1), rgb_emb.reshape(b, t, -1)],
            axis=-1,
        )
        out, hidden = self.state_encoder(
            jnp.swapaxes(x, 0, 1), hidden, jnp.swapaxes(masks, 0, 1)
        )
        out = jnp.swapaxes(out, 0, 1)
        logits = self.linear(out)
        if single:
            return logits[:, 0], hidden
        return logits, hidden
