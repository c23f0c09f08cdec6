"""Model zoo factory.

Mirrors the reference's trainer-side model selection:
robo_vln_trainer._setup_actor_critic_agent (robo_vln_trainer.py:313-339)
chooses CMANet when MODEL.CMA.use else Seq2SeqNet; hierarchical_trainer
builds the HighLevel/LowLevel pair (hierarchical_trainer.py:302-328).
"""

from robo_vln_tpu.models.cma import CMAPolicy
from robo_vln_tpu.models.hierarchical import HighLevelPolicy, LowLevelPolicy
from robo_vln_tpu.models.rcm import RCMStateEncoder
from robo_vln_tpu.models.rnn_state_encoder import RNNStateEncoder
from robo_vln_tpu.models.seq2seq import Seq2SeqPolicy


import jax.numpy as jnp

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def resolve_dtype(name) -> jnp.dtype:
    return _DTYPES.get(str(name), jnp.float32)


def build_flat_policy(model_config, num_actions=2, num_sub_tasks=4,
                      compute_dtype=jnp.float32):
    if model_config.CMA.use:
        return CMAPolicy(
            model_config=model_config, num_actions=num_actions,
            compute_dtype=compute_dtype,
        )
    return Seq2SeqPolicy(
        model_config=model_config,
        num_actions=num_actions,
        num_sub_tasks=num_sub_tasks,
        compute_dtype=compute_dtype,
    )


def build_hierarchical_policies(model_config, num_sub_tasks=4,
                                compute_dtype=jnp.float32):
    high = HighLevelPolicy(
        model_config=model_config, num_actions=num_sub_tasks,
        compute_dtype=compute_dtype,
    )
    low = LowLevelPolicy(
        model_config=model_config, num_actions=2, num_sub_tasks=num_sub_tasks,
        compute_dtype=compute_dtype,
    )
    return high, low


__all__ = [
    "CMAPolicy",
    "HighLevelPolicy",
    "LowLevelPolicy",
    "RCMStateEncoder",
    "RNNStateEncoder",
    "Seq2SeqPolicy",
    "build_flat_policy",
    "build_hierarchical_policies",
]
