"""Checkpointing: orbax save/load including optimizer state, plus a
PyTorch-checkpoint converter for parity evaluation.

The reference saves model-only state_dicts per epoch and never saves optimizer
state (SURVEY.md §5): ``{state_dict | high_level_state_dict +
low_level_state_dict, config}`` -> ckpt.{N}.pth (robo_vln_trainer.py:359-372).
Here a checkpoint is the FULL train state (params + optimizer + step) written
with orbax — resume is exact.  Torch .pth checkpoints from the reference are
converted with :func:`convert_torch_checkpoint` (requires torch, CPU-only).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, metadata: Optional[Dict] = None) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if metadata:
        import json

        with open(os.path.join(path, "framework_metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (a concrete train state)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(target))


def list_checkpoints(folder: str):
    """ckpt.{i} directories sorted by index (reference polls the folder for
    new ckpt.{i}.pth files, README.md:209)."""
    if not os.path.isdir(folder):
        return []
    out = []
    for name in os.listdir(folder):
        if name.startswith("ckpt."):
            try:
                idx = int(name.split(".")[1])
            except (IndexError, ValueError):
                continue
            out.append((idx, os.path.join(folder, name)))
    return [p for _, p in sorted(out)]


# ---------------------------------------------------------------------------
# torch -> flax policy conversion (parity path for reference checkpoints)
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "high_level_state_dict", "low_level_state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            return ckpt
    return ckpt


def convert_seq2seq_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference Seq2SeqNet state_dict -> Seq2SeqPolicy params (trainable
    parts; the frozen backbones are ported separately by weight_port)."""
    from robo_vln_tpu.utils import weight_port as wp

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    params["state_encoder"] = wp.port_torch_rnn(sd, "state_encoder.rnn.")
    params["linear"] = wp.port_linear(sd, "linear.")
    params["stop_linear"] = wp.port_linear(sd, "stop_linear.")
    if "sub_goal_linear.weight" in sd:
        params["sub_goal_linear"] = wp.port_linear(sd, "sub_goal_linear.")
    if "progress_monitor.weight" in sd:
        params["progress_monitor"] = wp.port_linear(sd, "progress_monitor.")
    # instruction encoder (GloVe path)
    ins = {}
    if "instruction_encoder.embedding_layer.weight" in sd:
        ins["embedding"] = sd["instruction_encoder.embedding_layer.weight"]
    if "instruction_encoder.encoder_rnn.weight_ih_l0" in sd:
        ins["fwd"] = wp.port_torch_rnn(sd, "instruction_encoder.encoder_rnn.")
        if "instruction_encoder.encoder_rnn.weight_ih_l0_reverse" in sd:
            rev = {
                "w_ih": sd["instruction_encoder.encoder_rnn.weight_ih_l0_reverse"].T,
                "w_hh": sd["instruction_encoder.encoder_rnn.weight_hh_l0_reverse"].T,
                "b_ih": sd["instruction_encoder.encoder_rnn.bias_ih_l0_reverse"],
                "b_hh": sd["instruction_encoder.encoder_rnn.bias_hh_l0_reverse"],
            }
            ins["bwd"] = rev
    if ins:
        params["instruction_encoder"] = ins
    # encoder heads
    depth = {}
    if "depth_encoder.visual_fc.1.weight" in sd:
        depth["visual_fc"] = wp.port_linear(sd, "depth_encoder.visual_fc.1.")
    if "depth_encoder.spatial_embeddings.weight" in sd:
        depth["spatial_embeddings"] = sd["depth_encoder.spatial_embeddings.weight"]
    depth_bb = {
        k[len("depth_encoder.visual_encoder."):]: v
        for k, v in sd.items()
        if k.startswith("depth_encoder.visual_encoder.")
        and "running" not in k and "num_batches" not in k
    }
    if depth_bb:
        depth["visual_encoder"] = wp.port_gn_resnet_encoder(depth_bb)
    if depth:
        params["depth_encoder"] = depth
    rgb = {}
    if "rgb_encoder.fc.weight" in sd:
        rgb["fc"] = wp.port_linear(sd, "rgb_encoder.fc.")
    if "rgb_encoder.spatial_embeddings.weight" in sd:
        rgb["spatial_embeddings"] = sd["rgb_encoder.spatial_embeddings.weight"]
    if rgb:
        params["rgb_encoder"] = rgb
    return params


def convert_rgb_backbone(sd: Dict[str, np.ndarray], prefix: str = "rgb_encoder.cnn."):
    """torchvision resnet50 weights inside a policy state_dict -> (params,
    batch_stats) for the TVResNet50 'cnn' submodule."""
    from robo_vln_tpu.utils import weight_port as wp

    sub = {
        k[len(prefix):]: np.asarray(v) for k, v in sd.items() if k.startswith(prefix)
    }
    if not sub:
        return None, None
    return wp.port_tv_resnet50(sub)
