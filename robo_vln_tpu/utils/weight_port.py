"""PyTorch -> flax weight porting for the frozen encoders and full policies.

Covers the three pretrained-weight surfaces of the reference:

* DDPPO depth ResNet (gibson-2plus-resnet50.pth; reference
  resnet_encoders.py:38-51 strips ``actor_critic.net.visual_encoder.`` and
  loads keys like ``backbone.conv1.0.weight`` / ``layer1.0.convs.3.weight`` /
  ``compression.0.weight``);
* torchvision ImageNet ResNet50 (``conv1.weight``, ``layer1.0.conv2.weight``,
  ``layer1.0.downsample.0.weight`` ...);
* HuggingFace BERT-base (``embeddings.word_embeddings.weight``,
  ``encoder.layer.N.attention.self.query.weight`` ...).

All functions take a flat ``{name: np.ndarray}`` dict (call ``.numpy()`` on a
torch state_dict first, or load an .npz) and return flax param/variable trees
matching the modules in models/encoders/.

Conv kernels: torch (O, I, kH, kW) -> flax NHWC (kH, kW, I, O).
Dense kernels: torch (O, I) -> flax (I, O).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def to_numpy_state_dict(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v) for k, v in state_dict.items()}


# ---------------------------------------------------------------------------
# DDPPO GroupNorm ResNet (depth)
# ---------------------------------------------------------------------------

_BLOCKS = (3, 4, 6, 3)


def _infer_blocks(sd: Mapping[str, np.ndarray], key_fmt: str):
    """Stage depths from the state-dict keys themselves (e.g. a reduced-depth
    test checkpoint); falls back to ResNet50's (3,4,6,3) when nothing
    matches."""
    blocks = []
    for li in range(1, 5):
        bi = 0
        while key_fmt.format(li=li, bi=bi) in sd:
            bi += 1
        blocks.append(bi)
    return tuple(blocks) if all(blocks) else _BLOCKS


def port_gn_resnet_encoder(sd: Mapping[str, np.ndarray], blocks=None) -> Dict:
    """Keys relative to habitat's ResNetEncoder (``backbone.*``,
    ``compression.*``) -> params for GNResNetEncoder.  blocks=None infers the
    stage depths from the keys."""
    if blocks is None:
        blocks = _infer_blocks(sd, "backbone.layer{li}.{bi}.convs.0.weight")
    p: Dict = {"backbone": {}}
    bb = p["backbone"]
    bb["conv1"] = {"kernel": _conv(sd["backbone.conv1.0.weight"])}
    bb["gn1"] = {
        "scale": sd["backbone.conv1.1.weight"],
        "bias": sd["backbone.conv1.1.bias"],
    }
    for li, nblocks in enumerate(blocks):
        for bi in range(nblocks):
            pre = f"backbone.layer{li + 1}.{bi}."
            blk = {
                "conv1": {"conv": {"kernel": _conv(sd[pre + "convs.0.weight"])}},
                "gn1": {"scale": sd[pre + "convs.1.weight"], "bias": sd[pre + "convs.1.bias"]},
                "conv2": {"conv": {"kernel": _conv(sd[pre + "convs.3.weight"])}},
                "gn2": {"scale": sd[pre + "convs.4.weight"], "bias": sd[pre + "convs.4.bias"]},
                "conv3": {"conv": {"kernel": _conv(sd[pre + "convs.6.weight"])}},
                "gn3": {"scale": sd[pre + "convs.7.weight"], "bias": sd[pre + "convs.7.bias"]},
            }
            if pre + "downsample.0.weight" in sd:
                blk["downsample_conv"] = {
                    "conv": {"kernel": _conv(sd[pre + "downsample.0.weight"])}
                }
                blk["downsample_gn"] = {
                    "scale": sd[pre + "downsample.1.weight"],
                    "bias": sd[pre + "downsample.1.bias"],
                }
            bb[f"layer{li + 1}_{bi}"] = blk
    p["compression_conv"] = {"kernel": _conv(sd["compression.0.weight"])}
    p["compression_gn"] = {
        "scale": sd["compression.1.weight"],
        "bias": sd["compression.1.bias"],
    }
    return p


def port_ddppo_depth_checkpoint(ckpt_state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Full DDPPO .pth ``state_dict`` -> GNResNetEncoder params, replicating
    the reference's key stripping (resnet_encoders.py:41-51)."""
    stripped = {}
    for k, v in ckpt_state_dict.items():
        parts = k.split(".")[2:]
        if not parts or parts[0] != "visual_encoder":
            continue
        stripped[".".join(parts[1:])] = np.asarray(v)
    return port_gn_resnet_encoder(stripped)


# ---------------------------------------------------------------------------
# torchvision ResNet50 (rgb)
# ---------------------------------------------------------------------------

def port_tv_resnet50(sd: Mapping[str, np.ndarray], blocks=None) -> Tuple[Dict, Dict]:
    """torchvision resnet50 state_dict -> (params, batch_stats) for TVResNet50.
    blocks=None infers the stage depths from the keys."""
    if blocks is None:
        blocks = _infer_blocks(sd, "layer{li}.{bi}.conv1.weight")
    params: Dict = {}
    stats: Dict = {}

    def bn(prefix_t: str, name: str):
        params[name] = {
            "scale": sd[prefix_t + ".weight"],
            "bias": sd[prefix_t + ".bias"],
        }
        stats[name] = {
            "mean": sd[prefix_t + ".running_mean"],
            "var": sd[prefix_t + ".running_var"],
        }

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    bn("bn1", "bn1")
    for li, nblocks in enumerate(blocks):
        for bi in range(nblocks):
            t = f"layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            params[f] = {}
            stats[f] = {}
            for ci in (1, 2, 3):
                params[f][f"conv{ci}"] = {
                    "conv": {"kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
                }
                params[f][f"bn{ci}"] = {
                    "scale": sd[f"{t}.bn{ci}.weight"],
                    "bias": sd[f"{t}.bn{ci}.bias"],
                }
                stats[f][f"bn{ci}"] = {
                    "mean": sd[f"{t}.bn{ci}.running_mean"],
                    "var": sd[f"{t}.bn{ci}.running_var"],
                }
            if f"{t}.downsample.0.weight" in sd:
                params[f]["downsample_conv"] = {
                    "conv": {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                }
                params[f]["downsample_bn"] = {
                    "scale": sd[f"{t}.downsample.1.weight"],
                    "bias": sd[f"{t}.downsample.1.bias"],
                }
                stats[f]["downsample_bn"] = {
                    "mean": sd[f"{t}.downsample.1.running_mean"],
                    "var": sd[f"{t}.downsample.1.running_var"],
                }
    return params, stats


# ---------------------------------------------------------------------------
# HuggingFace BERT
# ---------------------------------------------------------------------------

def port_bert(sd: Mapping[str, np.ndarray], num_layers: int = 12) -> Dict:
    """HF BertModel state_dict (keys relative to the model root, i.e.
    ``embeddings.*`` / ``encoder.layer.N.*``) -> BertEncoder params."""
    p: Dict = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "embeddings_ln": {
            "scale": sd["embeddings.LayerNorm.weight"],
            "bias": sd["embeddings.LayerNorm.bias"],
        },
    }
    for i in range(num_layers):
        t = f"encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "query": {
                "kernel": _dense(sd[t + "attention.self.query.weight"]),
                "bias": sd[t + "attention.self.query.bias"],
            },
            "key": {
                "kernel": _dense(sd[t + "attention.self.key.weight"]),
                "bias": sd[t + "attention.self.key.bias"],
            },
            "value": {
                "kernel": _dense(sd[t + "attention.self.value.weight"]),
                "bias": sd[t + "attention.self.value.bias"],
            },
            "attention_output": {
                "kernel": _dense(sd[t + "attention.output.dense.weight"]),
                "bias": sd[t + "attention.output.dense.bias"],
            },
            "attention_ln": {
                "scale": sd[t + "attention.output.LayerNorm.weight"],
                "bias": sd[t + "attention.output.LayerNorm.bias"],
            },
            "intermediate": {
                "kernel": _dense(sd[t + "intermediate.dense.weight"]),
                "bias": sd[t + "intermediate.dense.bias"],
            },
            "output": {
                "kernel": _dense(sd[t + "output.dense.weight"]),
                "bias": sd[t + "output.dense.bias"],
            },
            "output_ln": {
                "scale": sd[t + "output.LayerNorm.weight"],
                "bias": sd[t + "output.LayerNorm.bias"],
            },
        }
    return p


# ---------------------------------------------------------------------------
# torch RNN / Linear / Conv1d primitives (used by the policy ckpt converter)
# ---------------------------------------------------------------------------

def port_torch_rnn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """torch nn.LSTM/GRU layer-0 weights -> RNNStateEncoder params."""
    return {
        "w_ih": _dense(sd[prefix + "weight_ih_l0"]),
        "w_hh": _dense(sd[prefix + "weight_hh_l0"]),
        "b_ih": sd[prefix + "bias_ih_l0"],
        "b_hh": sd[prefix + "bias_hh_l0"],
    }


def port_linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    out = {"kernel": _dense(sd[prefix + "weight"])}
    if prefix + "bias" in sd:
        out["bias"] = sd[prefix + "bias"]
    return out


def port_conv1d_as_dense(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """torch nn.Conv1d(k=1) (O, I, 1) -> Dense over token channels (I, O)."""
    w = np.asarray(sd[prefix + "weight"])[:, :, 0]
    out = {"kernel": np.transpose(w, (1, 0))}
    if prefix + "bias" in sd:
        out["bias"] = sd[prefix + "bias"]
    return out
