"""Pretrained-weight loading for the frozen backbones.

The reference loads three pretrained weight sets at model construction:
DDPPO depth resnet (resnet_encoders.py:38-51), ImageNet torchvision resnet50
(resnet_encoders.py:144), and HF bert-base (seq2seq_highlevel_cma.py:45).
This image has no network egress, so weights arrive as files the user drops
under data/ — either the original torch artifacts (.pth, loaded via torch) or
pre-converted .npz exports:

  MODEL.DEPTH_ENCODER.ddppo_checkpoint  (torch .pth or .npz)
  MODEL.RGB_ENCODER.pretrained_weights  (torchvision state_dict .pth or .npz)
  MODEL.BERT.pretrained_weights         (HF BertModel state_dict .pth or .npz)

`graft_pretrained` walks a policy's variable tree and replaces every
`visual_encoder` (GN depth resnet), `cnn` (TV rgb resnet, incl. batch_stats),
and `embedding_layer` (BERT) subtree with the ported weights.  Missing files
are skipped with a log line (random init stays — documented in README).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from robo_vln_tpu.utils import weight_port as wp
from robo_vln_tpu.utils.logging import logger


def _load_state_dict(path: str) -> Optional[Dict[str, np.ndarray]]:
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        return dict(np.load(path, allow_pickle=False))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: np.asarray(v) for k, v in ckpt.items()}


def _shapes_match(dst, src) -> bool:
    import jax

    try:
        dst_leaves = jax.tree.leaves(dst)
        src_leaves = jax.tree.leaves(src)
        return len(dst_leaves) == len(src_leaves) and all(
            np.shape(a) == np.shape(b) for a, b in zip(dst_leaves, src_leaves)
        )
    except Exception:
        return False


def _replace_named_subtrees(tree: Dict, name: str, replacement) -> int:
    """In-place replace every subtree keyed `name`; returns count."""
    n = 0
    for k in list(tree.keys()):
        v = tree[k]
        if k == name and isinstance(v, dict):
            if _shapes_match(v, replacement):
                tree[k] = replacement
                n += 1
            else:
                logger.warning(
                    f"pretrained subtree {name!r} shape mismatch; skipped"
                )
        elif isinstance(v, dict):
            n += _replace_named_subtrees(v, name, replacement)
    return n


def graft_pretrained(variables: Dict[str, Any], model_config) -> Dict[str, Any]:
    """Returns variables with pretrained backbones grafted in (pure dicts)."""
    import jax

    variables = jax.tree.map(lambda x: x, dict(variables))  # shallow copy tree
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    # DDPPO depth resnet
    sd = _load_state_dict(model_config.DEPTH_ENCODER.ddppo_checkpoint)
    if sd is not None:
        try:
            if any(k.startswith("actor_critic") for k in sd):
                ported = wp.port_ddppo_depth_checkpoint(sd)
            else:
                ported = wp.port_gn_resnet_encoder(sd)
            n = _replace_named_subtrees(params, "visual_encoder", ported)
            logger.info(f"loaded DDPPO depth weights into {n} encoder(s)")
        except KeyError as e:
            logger.warning(f"DDPPO checkpoint missing key {e}; skipped")

    # torchvision rgb resnet50
    sd = _load_state_dict(model_config.RGB_ENCODER.pretrained_weights)
    if sd is not None:
        try:
            p, s = wp.port_tv_resnet50(sd)
            n = _replace_named_subtrees(params, "cnn", p)
            m = _replace_named_subtrees(stats, "cnn", s)
            logger.info(f"loaded ImageNet rgb weights into {n} encoder(s)")
        except KeyError as e:
            logger.warning(f"rgb checkpoint missing key {e}; skipped")

    # BERT
    sd = _load_state_dict(model_config.BERT.pretrained_weights)
    if sd is not None:
        try:
            ported = wp.port_bert(sd, num_layers=model_config.BERT.num_layers)
            n = _replace_named_subtrees(params, "embedding_layer", ported)
            logger.info(f"loaded BERT weights into {n} encoder(s)")
        except KeyError as e:
            logger.warning(f"BERT checkpoint missing key {e}; skipped")

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def export_torch_to_npz(torch_path: str, npz_path: str) -> None:
    """One-time conversion helper: torch state_dict -> flat .npz."""
    sd = _load_state_dict(torch_path)
    np.savez(npz_path, **{k: np.asarray(v) for k, v in sd.items()})
