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


def _count_named_subtrees(tree, name: str) -> int:
    n = 0
    for k, v in tree.items():
        if k == name and isinstance(v, dict):
            n += 1
        elif isinstance(v, dict):
            n += _count_named_subtrees(v, name)
    return n


def graft_pretrained(variables: Dict[str, Any], model_config
                     ) -> Tuple[Dict[str, Any], Dict[str, Dict]]:
    """Returns (variables with pretrained backbones grafted in, provenance).

    Provenance records, per backbone, whether the run uses REAL weights or
    random init — threaded into eval stats json so a random-backbone eval can
    never pass silently:
      status: "loaded" | "missing_file" (model needs it, no file) |
              "not_in_model" | "error"
    """
    import jax

    variables = jax.tree.map(lambda x: x, dict(variables))  # shallow copy tree
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    provenance: Dict[str, Dict] = {}

    def graft_one(name, path, subtree_name, port_fn):
        present = _count_named_subtrees(params, subtree_name)
        if present == 0:
            provenance[name] = {"status": "not_in_model"}
            return
        sd = _load_state_dict(path)
        if sd is None:
            provenance[name] = {"status": "missing_file", "path": str(path)}
            logger.warning(
                f"pretrained {name} weights not found at {path!r}; "
                f"{present} {subtree_name!r} subtree(s) stay RANDOM"
            )
            return
        try:
            n = port_fn(sd)
            provenance[name] = {
                "status": "loaded" if n else "error", "path": str(path)
            }
            logger.info(f"loaded {name} weights into {n} encoder(s)")
        except KeyError as e:
            provenance[name] = {
                "status": "error", "path": str(path),
                "detail": f"missing key {e}",
            }
            logger.warning(f"{name} checkpoint missing key {e}; skipped")

    # DDPPO depth resnet (reference resnet_encoders.py:38-51)
    def port_depth(sd):
        if any(k.startswith("actor_critic") for k in sd):
            ported = wp.port_ddppo_depth_checkpoint(sd)
        else:
            ported = wp.port_gn_resnet_encoder(sd)
        return _replace_named_subtrees(params, "visual_encoder", ported)

    graft_one("ddppo_depth", model_config.DEPTH_ENCODER.ddppo_checkpoint,
              "visual_encoder", port_depth)

    # torchvision rgb resnet50 (reference resnet_encoders.py:144)
    def port_rgb(sd):
        p, s = wp.port_tv_resnet50(sd)
        n = _replace_named_subtrees(params, "cnn", p)
        _replace_named_subtrees(stats, "cnn", s)
        return n

    graft_one("imagenet_rgb", model_config.RGB_ENCODER.pretrained_weights,
              "cnn", port_rgb)

    # BERT (reference seq2seq_highlevel_cma.py:45)
    def port_bert_fn(sd):
        ported = wp.port_bert(sd, num_layers=model_config.BERT.num_layers)
        return _replace_named_subtrees(params, "embedding_layer", ported)

    graft_one("bert", model_config.BERT.pretrained_weights,
              "embedding_layer", port_bert_fn)

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out, provenance


def export_torch_to_npz(torch_path: str, npz_path: str) -> None:
    """One-time conversion helper: torch state_dict -> flat .npz."""
    sd = _load_state_dict(torch_path)
    np.savez(npz_path, **{k: np.asarray(v) for k, v in sd.items()})
