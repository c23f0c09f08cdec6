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


def _flatten_tree(d: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_extra_variables(ckpt_dir: str, extra: Dict) -> None:
    """Persist non-param variable collections (frozen BN batch_stats) next to
    an orbax train state.  Train states only carry params/opt/step; for
    CONVERTED reference checkpoints the BN stats come from the .pth and would
    otherwise be lost (graft_pretrained can only refill them when the weight
    files exist)."""
    flat = _flatten_tree(jax.device_get(dict(extra)))
    if flat:
        np.savez(os.path.join(ckpt_dir, "extra_variables.npz"), **flat)


def load_extra_variables(ckpt_dir: str) -> Optional[Dict]:
    p = os.path.join(str(ckpt_dir), "extra_variables.npz")
    if not os.path.exists(p):
        return None
    out: Dict = {}
    with np.load(p) as z:
        for k in z.files:
            node = out
            parts = k.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = z[k]
    return out


def load_metadata(ckpt_dir: str) -> Optional[Dict]:
    """Framework metadata saved next to an orbax train state (config snapshot
    + loop counters for DAGGER.RESUME)."""
    p = os.path.join(str(ckpt_dir), "framework_metadata.json")
    if not os.path.exists(p):
        return None
    import json

    with open(p) as f:
        return json.load(f)


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


def convert_rgb_backbone(sd: Dict[str, np.ndarray], prefix: str = "rgb_encoder.cnn.",
                         blocks=None):
    """torchvision resnet50 weights inside a policy state_dict -> (params,
    batch_stats) for the TVResNet50 'cnn' submodule."""
    from robo_vln_tpu.utils import weight_port as wp

    sub = {
        k[len(prefix):]: np.asarray(v) for k, v in sd.items() if k.startswith(prefix)
    }
    if not sub:
        return None, None
    if blocks is None:
        return wp.port_tv_resnet50(sub)
    return wp.port_tv_resnet50(sub, blocks=blocks)


# -- shared porting helpers ----------------------------------------------------

def _subdict(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _ln(sd, prefix):
    return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}


def _port_mha(sd, prefix):
    """Reference MultiHeadAttention (transformer.py:111-126): explicit QKVO
    linears inside .attention, post-LN."""
    from robo_vln_tpu.utils import weight_port as wp

    return {
        "fc_q": wp.port_linear(sd, prefix + "attention.fc_q."),
        "fc_k": wp.port_linear(sd, prefix + "attention.fc_k."),
        "fc_v": wp.port_linear(sd, prefix + "attention.fc_v."),
        "fc_o": wp.port_linear(sd, prefix + "attention.fc_o."),
        "layer_norm": _ln(sd, prefix + "layer_norm."),
    }


def _port_pwff(sd, prefix):
    from robo_vln_tpu.utils import weight_port as wp

    return {
        "fc1": wp.port_linear(sd, prefix + "fc1."),
        "fc2": wp.port_linear(sd, prefix + "fc2."),
        "layer_norm": _ln(sd, prefix + "layer_norm."),
    }


def _port_visual_ling_attn(sd, prefix):
    """Reference Visual_Ling_Attn (transformer.py:251-281) -> VisualLingAttn
    params (models/transformer.py)."""
    from robo_vln_tpu.utils import weight_port as wp

    p = {
        "vis_fc": wp.port_linear(sd, prefix + "vis_fc."),
        "ins_fc": wp.port_linear(sd, prefix + "ins_fc."),
        "layer_norm": _ln(sd, prefix + "layer_norm."),
    }
    i = 0
    while f"{prefix}layers.{i}.enc_att.attention.fc_q.weight" in sd:
        p[f"layers_{i}"] = {
            "enc_att": _port_mha(sd, f"{prefix}layers.{i}.enc_att."),
            "pwff": _port_pwff(sd, f"{prefix}layers.{i}.pwff."),
        }
        i += 1
    return p


def _port_spatial_embeddings(weight, n_tokens: int) -> np.ndarray:
    """Reference spatial embeddings are concatenated channel-major via
    ``emb(arange(S)).view(1, -1, h, w)`` (resnet_encoders.py:91-102) — torch's
    row-major view SCRAMBLES (token, dim) into (dim, token): channel k at
    token p reads weight.flatten()[k*S + p].  Our token-major layout wants
    [p, k], so the ported table is flatten().reshape(64, S).T."""
    w = np.asarray(weight)
    dim = w.size // n_tokens
    return w.reshape(-1).reshape(dim, n_tokens).T


def _port_depth_encoder(sd, prefix, spatial: bool, blocks=None):
    """VlnResnetDepthEncoder (resnet_encoders.py:13-108) -> DepthEncoder
    params: frozen GN backbone + (visual_fc | scrambled spatial table)."""
    from robo_vln_tpu.utils import weight_port as wp

    bb = {
        k: v for k, v in _subdict(sd, prefix + "visual_encoder.").items()
        if "running" not in k and "num_batches" not in k
    }
    kwargs = {} if blocks is None else {"blocks": blocks}
    p = {"visual_encoder": wp.port_gn_resnet_encoder(bb, **kwargs)}
    if spatial:
        w = sd[prefix + "spatial_embeddings.weight"]
        p["spatial_embeddings"] = _port_spatial_embeddings(w, len(np.asarray(w)))
    else:
        p["visual_fc"] = wp.port_linear(sd, prefix + "visual_fc.1.")
    return p


def _port_rgb_encoder(sd, prefix, spatial: bool, blocks=None):
    """TorchVisionResNet50 (resnet_encoders.py:111-237) -> RGBEncoder
    (params, batch_stats)."""
    from robo_vln_tpu.utils import weight_port as wp

    cnn_params, cnn_stats = convert_rgb_backbone(sd, prefix + "cnn.", blocks=blocks)
    p = {"cnn": cnn_params}
    if spatial:
        w = sd[prefix + "spatial_embeddings.weight"]
        p["spatial_embeddings"] = _port_spatial_embeddings(w, len(np.asarray(w)))
    else:
        p["fc"] = wp.port_linear(sd, prefix + "fc.")
    return p, {"cnn": cnn_stats}


def convert_high_level_state_dict(sd: Dict[str, np.ndarray], blocks=None) -> Dict:
    """Reference Seq2Seq_HighLevel_CMA state_dict
    (seq2seq_highlevel_cma.py:29-233) -> HighLevelPolicy variables
    ({"params", "batch_stats"}).  `blocks` overrides the ResNet block counts
    for reduced test-scale trunks."""
    from robo_vln_tpu.utils import weight_port as wp

    sd = {k: np.asarray(v) for k, v in sd.items()}
    n_bert = 0
    while f"embedding_layer.encoder.layer.{n_bert}.attention.self.query.weight" in sd:
        n_bert += 1
    params: Dict = {
        "embedding_layer": wp.port_bert(
            _subdict(sd, "embedding_layer."), num_layers=n_bert
        ),
        "depth_encoder": _port_depth_encoder(
            sd, "depth_encoder.", spatial=True, blocks=blocks
        ),
        "rgb_kv": wp.port_conv1d_as_dense(sd, "rgb_kv."),
        "depth_kv": wp.port_conv1d_as_dense(sd, "depth_kv."),
        "image_cm_encoder": _port_visual_ling_attn(sd, "image_cm_encoder."),
        # Sequential indices: rgb_linear = [pool, flatten, Linear@2, relu],
        # depth_linear = [flatten, Linear@1, relu] (seq2seq_highlevel_cma.py:83-100)
        "rgb_linear": wp.port_linear(sd, "rgb_linear.2."),
        "depth_linear": wp.port_linear(sd, "depth_linear.1."),
        "state_encoder": wp.port_torch_rnn(sd, "state_encoder.rnn."),
        "progress_monitor": wp.port_linear(sd, "progress_monitor."),
        "linear": wp.port_linear(sd, "linear."),
    }
    rgb_p, rgb_stats = _port_rgb_encoder(sd, "rgb_encoder.", spatial=True, blocks=blocks)
    params["rgb_encoder"] = rgb_p
    return {"params": params, "batch_stats": {"rgb_encoder": rgb_stats}}


def convert_low_level_state_dict(sd: Dict[str, np.ndarray], blocks=None) -> Dict:
    """Reference Seq2Seq_LowLevel state_dict (seq2seq_lowlevel.py:21-162) ->
    LowLevelPolicy variables."""
    from robo_vln_tpu.utils import weight_port as wp

    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {
        "depth_encoder": _port_depth_encoder(
            sd, "depth_encoder.", spatial=False, blocks=blocks
        ),
        "sub_task_embedding": {"embedding": sd["sub_task_embedding.weight"]},
        "state_encoder": wp.port_torch_rnn(sd, "state_encoder.rnn."),
        "progress_monitor": wp.port_linear(sd, "progress_monitor."),
        "linear": wp.port_linear(sd, "linear."),
        "stop_linear": wp.port_linear(sd, "stop_linear."),
    }
    rgb_p, rgb_stats = _port_rgb_encoder(sd, "rgb_encoder.", spatial=False, blocks=blocks)
    params["rgb_encoder"] = rgb_p
    return {"params": params, "batch_stats": {"rgb_encoder": rgb_stats}}


def convert_hierarchical_checkpoint(ckpt: Dict, blocks=None):
    """Reference hierarchical ckpt ({high_level_state_dict,
    low_level_state_dict}, hierarchical_trainer.py:349-363 — the published
    HCM_Agent.pth layout, README.md:251-255) -> (high_vars, low_vars)."""
    return (
        convert_high_level_state_dict(ckpt["high_level_state_dict"], blocks=blocks),
        convert_low_level_state_dict(ckpt["low_level_state_dict"], blocks=blocks),
    )


def convert_cma_state_dict(sd: Dict[str, np.ndarray], blocks=None) -> Dict:
    """Reference CMANet state_dict (cma.py:20-333) -> CMAPolicy variables."""
    from robo_vln_tpu.utils import weight_port as wp

    sd = {k: np.asarray(v) for k, v in sd.items()}
    ins: Dict = {}
    if "instruction_encoder.embedding_layer.weight" in sd:
        ins["embedding"] = sd["instruction_encoder.embedding_layer.weight"]
    ins["fwd"] = wp.port_torch_rnn(sd, "instruction_encoder.encoder_rnn.")
    if "instruction_encoder.encoder_rnn.weight_ih_l0_reverse" in sd:
        ins["bwd"] = {
            "w_ih": sd["instruction_encoder.encoder_rnn.weight_ih_l0_reverse"].T,
            "w_hh": sd["instruction_encoder.encoder_rnn.weight_hh_l0_reverse"].T,
            "b_ih": sd["instruction_encoder.encoder_rnn.bias_ih_l0_reverse"],
            "b_hh": sd["instruction_encoder.encoder_rnn.bias_hh_l0_reverse"],
        }
    params: Dict = {
        "instruction_encoder": ins,
        "depth_encoder": _port_depth_encoder(
            sd, "depth_encoder.", spatial=True, blocks=blocks
        ),
        "rgb_linear": wp.port_linear(sd, "rgb_linear.2."),
        "depth_linear": wp.port_linear(sd, "depth_linear.1."),
        "state_encoder": wp.port_torch_rnn(sd, "state_encoder.rnn."),
        "second_state_encoder": wp.port_torch_rnn(sd, "second_state_encoder.rnn."),
        "rgb_kv": wp.port_conv1d_as_dense(sd, "rgb_kv."),
        "depth_kv": wp.port_conv1d_as_dense(sd, "depth_kv."),
        "state_q": wp.port_linear(sd, "state_q."),
        "text_k": wp.port_conv1d_as_dense(sd, "text_k."),
        "text_q": wp.port_linear(sd, "text_q."),
        "second_state_compress": wp.port_linear(sd, "second_state_compress.0."),
        "progress_monitor": wp.port_linear(sd, "progress_monitor."),
        "linear": wp.port_linear(sd, "linear."),
        "stop_linear": wp.port_linear(sd, "stop_linear."),
    }
    if "prev_action_embedding.weight" in sd:
        params["prev_action_embedding"] = {
            "embedding": sd["prev_action_embedding.weight"]
        }
    rgb_p, rgb_stats = _port_rgb_encoder(sd, "rgb_encoder.", spatial=True, blocks=blocks)
    params["rgb_encoder"] = rgb_p
    return {"params": params, "batch_stats": {"rgb_encoder": rgb_stats}}


def convert_torch_checkpoint(path: str, blocks=None):
    """Load a reference .pth and convert: returns ("hierarchical", (high_vars,
    low_vars)) for HCM checkpoints, ("cma", vars) for CMANet, or ("seq2seq",
    params) for flat Seq2SeqNet ones."""
    ckpt = load_torch_state_dict(path)
    if "high_level_state_dict" in ckpt:
        return "hierarchical", convert_hierarchical_checkpoint(ckpt, blocks=blocks)
    sd = ckpt.get("state_dict", ckpt)
    if any(k.startswith("second_state_encoder.") for k in sd):
        return "cma", convert_cma_state_dict(sd, blocks=blocks)
    return "seq2seq", convert_seq2seq_state_dict(sd)


# ---------------------------------------------------------------------------
# .pth -> live trainer state (the user-facing `run.py --run-type eval` path
# for the published HCM_Agent.pth, reference README.md:251-255; loaded there
# at hierarchical_trainer.py:996-1006)
# ---------------------------------------------------------------------------

# heads the reference constructs UNCONDITIONALLY (so they sit in every
# state_dict) but that this framework only builds when configured on:
# progress_monitor (PROGRESS_MONITOR.use), sub_goal_linear (unused in the
# reference loss, seq2seq.py:109).  Safe to drop when the policy lacks them.
_OPTIONAL_CKPT_KEYS = frozenset({"progress_monitor", "sub_goal_linear"})


def merge_converted(dst: Dict, src: Dict, path: str = "") -> int:
    """Recursively replace leaves of `dst` (an initialized variable tree) with
    matching leaves of `src` (a converted torch tree).  Keys of `dst` absent
    from `src` keep their initialized values; keys of `src` absent from `dst`
    raise (a converted weight that lands nowhere is a layout bug, not noise)
    unless they are known optional heads.  Returns leaves replaced."""
    n = 0
    for k, v in src.items():
        here = f"{path}.{k}" if path else str(k)
        if k not in dst:
            if k in _OPTIONAL_CKPT_KEYS:
                from robo_vln_tpu.utils.logging import logger

                logger.info(
                    f"checkpoint head {here!r} not present in the policy "
                    "(disabled by config); skipped"
                )
                continue
            raise KeyError(
                f"converted checkpoint key {here!r} does not exist in the "
                "initialized policy (wrong MODEL config for this .pth?)"
            )
        if isinstance(v, dict) and isinstance(dst[k], dict):
            n += merge_converted(dst[k], v, here)
            continue
        if np.shape(dst[k]) != np.shape(v):
            raise ValueError(
                f"shape mismatch at {here!r}: policy {np.shape(dst[k])} vs "
                f"checkpoint {np.shape(v)} (wrong MODEL config for this .pth?)"
            )
        dst[k] = np.asarray(v)
        n += 1
    return n


def _mutable_tree(tree):
    """Deep-copied structure (fresh plain dicts), same array leaves."""
    return jax.tree.map(lambda x: x, dict(tree))


def _blocks_from_config(config):
    b_depth = list(config.MODEL.DEPTH_ENCODER.blocks)
    b_rgb = list(config.MODEL.RGB_ENCODER.blocks)
    if b_depth != b_rgb:
        from robo_vln_tpu.utils.logging import logger

        logger.warning(
            f"DEPTH_ENCODER.blocks {b_depth} != RGB_ENCODER.blocks {b_rgb}; "
            "the torch converter uses one block layout — using depth's"
        )
    return b_depth


def load_torch_into_flat_trainer(trainer, path: str) -> Dict[str, int]:
    """Convert a reference flat .pth (Seq2SeqNet or CMANet) and graft it into
    a set-up RoboVLNTrainer's state.  ALL weights — trainable heads AND the
    frozen trunks stored in the state_dict — come from the checkpoint, so a
    subsequent eval needs no separate backbone files.  Returns per-collection
    replaced-leaf counts."""
    from robo_vln_tpu.utils.logging import logger

    blocks = _blocks_from_config(trainer.config)
    kind, conv = convert_torch_checkpoint(path, blocks=blocks)
    if kind == "hierarchical":
        raise ValueError(
            f"{path} is a hierarchical (HCM) checkpoint; evaluate it with "
            "TRAINER_NAME hierarchical_trainer"
        )
    if kind == "seq2seq":
        params_src, stats_src = conv, None
        sd = load_torch_state_dict(path)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: np.asarray(v) for k, v in sd.items()}
        cnn_p, cnn_s = convert_rgb_backbone(sd, "rgb_encoder.cnn.", blocks=blocks)
        if cnn_p is not None:
            params_src.setdefault("rgb_encoder", {})["cnn"] = cnn_p
            stats_src = {"rgb_encoder": {"cnn": cnn_s}}
    else:  # cma
        params_src = conv["params"]
        stats_src = conv.get("batch_stats")

    params = _mutable_tree(trainer.state.params)
    n_params = merge_converted(params, params_src)
    trainer.state = trainer.state._replace(params=params)
    n_stats = 0
    if stats_src and "batch_stats" in trainer.extra_variables:
        bs = _mutable_tree(trainer.extra_variables["batch_stats"])
        n_stats = merge_converted(bs, stats_src)
        trainer.extra_variables = dict(trainer.extra_variables)
        trainer.extra_variables["batch_stats"] = bs
    logger.info(
        f"converted {kind} torch checkpoint {path}: {n_params} param leaves, "
        f"{n_stats} batch-stat leaves"
    )
    return {"kind": kind, "params": n_params, "batch_stats": n_stats}


def load_torch_into_hier_trainer(trainer, path: str) -> Dict[str, int]:
    """Convert a reference hierarchical .pth (the HCM_Agent.pth layout) and
    graft it into a set-up HierarchicalTrainer's state."""
    from robo_vln_tpu.utils.logging import logger

    blocks = _blocks_from_config(trainer.config)
    kind, conv = convert_torch_checkpoint(path, blocks=blocks)
    if kind != "hierarchical":
        raise ValueError(
            f"{path} is a flat ({kind}) checkpoint; evaluate it with "
            "TRAINER_NAME robo_vln_trainer"
        )
    high_vars, low_vars = conv
    counts = {"kind": kind}
    for name, vars_src, state_attr, extra_attr in (
        ("high", high_vars, "high", "_high_extra"),
        ("low", low_vars, "low", "_low_extra"),
    ):
        sub = getattr(trainer.state, state_attr)
        params = _mutable_tree(sub.params)
        counts[f"{name}_params"] = merge_converted(params, vars_src["params"])
        trainer.state = trainer.state._replace(
            **{state_attr: sub._replace(params=params)}
        )
        extra = dict(getattr(trainer, extra_attr))
        if "batch_stats" in vars_src and "batch_stats" in extra:
            bs = _mutable_tree(extra["batch_stats"])
            counts[f"{name}_batch_stats"] = merge_converted(
                bs, vars_src["batch_stats"]
            )
            extra["batch_stats"] = bs
            setattr(trainer, extra_attr, extra)
    logger.info(f"converted hierarchical torch checkpoint {path}: {counts}")
    return counts


def torch_checkpoint_config(path: str) -> Optional[Dict]:
    """Best-effort read of the training config stored inside a reference .pth
    (saved at robo_vln_trainer.py:359-372).  The pickled yacs CfgNode needs
    yacs importable; degrade to None (eval config used) when it isn't."""
    try:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        cfg = ckpt.get("config") if isinstance(ckpt, dict) else None
        if cfg is None:
            return None
        if isinstance(cfg, dict):
            return dict(cfg)
        # yacs CfgNode subclasses dict; convert_to_dict-style walk
        def walk(node):
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return node

        return walk(dict(cfg))
    except Exception as e:  # missing yacs, truncated file, ...
        from robo_vln_tpu.utils.logging import logger

        logger.warning(f"could not read config from {path}: {e}")
        return None
