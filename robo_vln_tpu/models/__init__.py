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


# ---------------------------------------------------------------------------
# Frozen-trunk sharing (TPU.SHARE_FROZEN_TRUNKS)
#
# The reference's high AND low modules each own a frozen DDPPO depth ResNet50
# and a frozen torchvision ResNet50, loaded from the SAME weight files and
# never trained (resnet_encoders.py:35-51,144; seq2seq_lowlevel.py:21-162) —
# so the combined hierarchical step runs the two dominant conv trunks TWICE
# on identical inputs with identical weights.  XLA cannot CSE across distinct
# parameter arrays, so the dedup is done here: compute each trunk ONCE (with
# the high level's copies) and feed both policies precomputed features.
# Guarded by an exact weight-equality check — policies whose trunk copies
# differ (deliberately, or randomly initialized in tests) fall back to the
# faithful two-pass forward.
# ---------------------------------------------------------------------------

import jax as _jax
import numpy as _np


def _subtree(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


_TRUNK_PATHS = (
    ("rgb_encoder", "cnn"),
    ("depth_encoder", "visual_encoder"),
)


def frozen_trunks_identical(high_params, low_params, high_extra=None,
                            low_extra=None) -> bool:
    """True iff both policies hold bitwise-identical frozen trunk weights
    (params and BN stats) — the precondition for sharing trunk compute."""
    trees = [(high_params, low_params)]
    hb = (high_extra or {}).get("batch_stats", {})
    lb = (low_extra or {}).get("batch_stats", {})
    trees.append((hb, lb))
    for ht, lt in trees:
        for path in _TRUNK_PATHS:
            a, b = _subtree(ht, path), _subtree(lt, path)
            if a is None or b is None:
                if a is not b:
                    return False
                continue
            la, lb_ = _jax.tree.leaves(a), _jax.tree.leaves(b)
            if len(la) != len(lb_):
                return False
            for x, y in zip(la, lb_):
                x, y = _np.asarray(x), _np.asarray(y)
                if x.shape != y.shape or not _np.array_equal(x, y):
                    return False
    return True


def sync_frozen_trunks(high_vars, low_vars):
    """Return low_vars with its frozen trunk weights (params + BN stats)
    replaced by COPIES of the high level's — the production invariant (both
    modules load the SAME pretrained DDPPO/ImageNet files, reference
    resnet_encoders.py:35-51,144).  Random-init studies/smokes call this so
    TPU.SHARE_FROZEN_TRUNKS and feature-store training engage exactly as in
    production.  Copies, not aliases: a donated train step must never be
    handed the same buffer twice (docs/TPU_ENV_NOTES.md)."""
    low_vars = _jax.tree.map(lambda x: x, low_vars)  # shallow rebuild
    for col in ("params", "batch_stats"):
        if col not in high_vars or col not in low_vars:
            continue
        for path in _TRUNK_PATHS:
            src = _subtree(high_vars[col], path)
            if src is None or _subtree(low_vars[col], path) is None:
                continue
            node = low_vars[col]
            for key in path[:-1]:
                node = node[key]
            node[path[-1]] = _jax.tree.map(_np.array, src)
    return low_vars


def make_shared_trunk_fn(model_config, compute_dtype, high_extra):
    """(high_params, obs) -> {"rgb_features", "depth_features"} computed ONCE
    with the high level's frozen trunks; both policies consume the features
    through the encoders' precomputed-feature path (encoders/visual.py).

    Note: closes over the (small, frozen) BN stats — params stay jit
    arguments per the remote-compile rule (docs/TPU_ENV_NOTES.md)."""
    from robo_vln_tpu.models.encoders.resnet import GNResNetEncoder, TVResNet50

    mc = model_config
    gn = GNResNetEncoder(
        spatial_size=256, blocks=tuple(mc.DEPTH_ENCODER.blocks),
        compute_dtype=compute_dtype,
    )
    tv = TVResNet50(
        blocks=tuple(mc.RGB_ENCODER.blocks), compute_dtype=compute_dtype
    )
    bn_stats = _subtree(
        (high_extra or {}).get("batch_stats", {}), ("rgb_encoder", "cnn")
    ) or {}

    def trunk_fn(high_params, observations):
        rgb, depth = observations["rgb"], observations["depth"]
        single = rgb.ndim == 4
        rgb5 = rgb[:, None] if single else rgb
        depth5 = depth[:, None] if single else depth
        b, t = rgb5.shape[:2]
        n = b * t
        rgb_flat = rgb5.reshape((n,) + rgb5.shape[2:])
        depth_flat = depth5.reshape((n,) + depth5.shape[2:])
        # exact mirror of RGBEncoder/DepthEncoder trunk forwards
        # (encoders/visual.py:110-121, :57-70)
        rgb_map = tv.apply(
            {"params": high_params["rgb_encoder"]["cnn"],
             "batch_stats": bn_stats},
            rgb_flat.astype(compute_dtype) / 255.0,
        )
        depth_map = gn.apply(
            {"params": high_params["depth_encoder"]["visual_encoder"]},
            depth_flat,
        )
        lead = (b,) if single else (b, t)
        return {
            "rgb_features": _jax.lax.stop_gradient(
                rgb_map.reshape(lead + rgb_map.shape[1:])
            ),
            "depth_features": _jax.lax.stop_gradient(
                depth_map.reshape(lead + depth_map.shape[1:])
            ),
        }

    return trunk_fn


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
