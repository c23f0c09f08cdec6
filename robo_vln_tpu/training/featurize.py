"""Trunk-feature pre-extraction: run the frozen conv trunks over a collected
buffer ONCE, train forever after from features.

The frozen encoders (DDPPO depth ResNet50, torchvision ResNet50 — reference
resnet_encoders.py:35-51,144) never change during IL training, and all paper
configs train from a fixed offline buffer (PRELOAD_LMDB_FEATURES) — so the
trunk forward, the dominant per-step FLOPs, is a pure function of the buffer.
`ensure_featurized` materializes a sibling `<buffer>.features` store whose
episodes carry `rgb_features` / `depth_features` (f16 trunk outputs) instead
of raw frames; the policies consume them through the encoders'
precomputed-feature path and the train step shrinks to the trainable stack
(cross-modal attention + LSTMs + heads).

For BERT-based models (the HCM agent) the frozen instruction embedding is a
pure function of the buffer too: `featurize_buffer` additionally stores one
`instruction_embedding` (L, 768) f16 row per episode — BERT over the ids
padded to DAGGER.MAX_INSTRUCTION_LEN, exactly what the collated train batch
would feed it (no attention mask, the reference quirk) — and the high-level
policy consumes it through its `instruction_embedding` fast path
(models/hierarchical.py).  Measured: the frozen BERT forward is 4.3 ms of
the 5.8 ms feature-mode forward at B=4,T=50
(benchmarks/feature_step_profile.py `bert`).

The cache is keyed by a fingerprint of the frozen weights (trunks + BERT) —
re-grafting different backbones invalidates and rebuilds it.  Closed-loop
eval always runs the full forward (frames arrive from the simulator), with
its own per-episode BERT cache (eval/evaluator.py).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Optional

import numpy as np

import jax

from robo_vln_tpu.data import serialization
from robo_vln_tpu.data.trajectory_store import TrajectoryStore
from robo_vln_tpu.utils.logging import logger

_FEATURE_DTYPE = np.float16
_META = "featurize_meta.json"


def trunk_fingerprint(params: Dict, extra: Optional[Dict] = None) -> str:
    """sha256 over the frozen weights (conv trunks + BERT, params + BN
    stats)."""
    h = hashlib.sha256()
    for tree in (params, (extra or {}).get("batch_stats", {})):
        for path in (("rgb_encoder", "cnn"), ("depth_encoder", "visual_encoder"),
                     ("embedding_layer",)):
            node = tree
            for k in path:
                node = node.get(k, {}) if isinstance(node, dict) else {}
            for leaf in jax.tree.leaves(node):
                h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def featurize_buffer(model_config, compute_dtype, params: Dict, extra: Dict,
                     raw_dir: str, out_dir: str, chunk: int = 32,
                     start_key: int = 0, max_instruction_len: int = 200) -> int:
    """Write the featurized twin of `raw_dir` into `out_dir`, starting at
    `start_key` (incremental append for a grown buffer).  Episodes keep
    every key except rgb/depth, which become `{rgb,depth}_features` (f16);
    BERT models additionally gain a per-episode `instruction_embedding`
    (max_instruction_len, 768) f16 row.  One fixed-chunk jitted trunk
    program (frames padded to `chunk`) keeps the compile count at one."""
    from robo_vln_tpu.models import make_shared_trunk_fn

    trunk_fn = make_shared_trunk_fn(model_config, compute_dtype, extra)

    @jax.jit
    def run_chunk(params, rgb, depth):
        feats = trunk_fn(params, {"rgb": rgb, "depth": depth})
        return (
            feats["rgb_features"].astype(np.float16),
            feats["depth_features"].astype(np.float16),
        )

    embed_fn = None
    if "embedding_layer" in params:
        from robo_vln_tpu.models.encoders.bert import BertEncoder

        bc = model_config.BERT
        bert = BertEncoder(
            vocab_size=bc.vocab_size, hidden_size=bc.hidden_size,
            num_layers=bc.num_layers, num_heads=bc.num_heads,
            intermediate_size=bc.intermediate_size,
            max_position_embeddings=bc.max_position_embeddings,
            compute_dtype=compute_dtype,
        )

        @jax.jit
        def embed_fn(params, ids):
            out = bert.apply({"params": params["embedding_layer"]}, ids[None])
            return out[0].astype(np.float16)

    n_eps = 0
    with TrajectoryStore(raw_dir) as src, \
            TrajectoryStore(out_dir, writable=True) as dst:
        total = len(src)
        for key in range(start_key, total):
            obs, prev, corr, stop = serialization.unpackb_any(
                src.get_buffer(key)
            )
            rgb = np.asarray(obs["rgb"])
            depth = np.asarray(obs["depth"])
            t = rgb.shape[0]
            rgb_f, depth_f = [], []
            for s in range(0, t, chunk):
                r = rgb[s:s + chunk]
                d = depth[s:s + chunk]
                pad = chunk - len(r)
                if pad:
                    r = np.concatenate([r, np.zeros((pad,) + r.shape[1:], r.dtype)])
                    d = np.concatenate([d, np.zeros((pad,) + d.shape[1:], d.dtype)])
                rf, df = run_chunk(params, r[None], d[None])
                rgb_f.append(np.asarray(rf)[0, : chunk - pad if pad else chunk])
                depth_f.append(np.asarray(df)[0, : chunk - pad if pad else chunk])
            new_obs = {k: v for k, v in obs.items() if k not in ("rgb", "depth")}
            new_obs["rgb_features"] = np.concatenate(rgb_f).astype(_FEATURE_DTYPE)
            new_obs["depth_features"] = np.concatenate(depth_f).astype(
                _FEATURE_DTYPE
            )
            if embed_fn is not None:
                # the ids exactly as the collated train batch feeds BERT: the
                # episode row zero-padded to MAX_INSTRUCTION_LEN (pad tokens
                # are attended — the reference's no-attention-mask quirk, so
                # the pad length is part of the function)
                row = np.asarray(obs["instruction"]).reshape(t, -1)[0]
                ids = np.zeros(max_instruction_len, np.int32)
                n_ids = min(len(row), max_instruction_len)
                ids[:n_ids] = row[:n_ids]
                new_obs["instruction_embedding"] = np.asarray(
                    embed_fn(params, ids)
                )
            # flat wire format: training decodes these at memory speed
            # (zero-copy views; data/serialization.py)
            dst.put(key, serialization.pack_flat([new_obs, prev, corr, stop]))
            n_eps += 1
            if n_eps % 100 == 0:
                dst.flush()
                logger.info(f"featurized {n_eps}/{total} episodes")
        dst.flush()
    return n_eps


def ensure_featurized(config, compute_dtype, params: Dict, extra: Dict,
                      raw_dir: str) -> str:
    """Return the featurized twin directory for `raw_dir`, building or
    rebuilding it when missing or stale (trunk weights changed / buffer
    grew)."""
    out_dir = raw_dir.rstrip("/") + ".features"
    fp = trunk_fingerprint(params, extra)
    max_len = config.DAGGER.MAX_INSTRUCTION_LEN
    with TrajectoryStore(raw_dir) as src:
        src_len = len(src)
    meta_path = os.path.join(out_dir, _META)
    start_key = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        have = meta.get("episodes", 0)
        # the stored BERT rows bake the pad length in (pad tokens are
        # attended — no-mask quirk), so a MAX_INSTRUCTION_LEN change makes
        # BERT-model caches stale just like a weight change would
        len_ok = ("embedding_layer" not in params
                  or meta.get("max_instruction_len") == max_len)
        if meta.get("fingerprint") == fp and len_ok and have == src_len:
            logger.info(f"reusing featurized buffer {out_dir} ({src_len} eps)")
            return out_dir
        if meta.get("fingerprint") == fp and len_ok and 0 < have < src_len:
            # append-only growth (keys are dense): featurize only the new
            # tail — a DAgger loop must not re-run the trunks over the whole
            # buffer every iteration
            start_key = have
            logger.info(
                f"featurized buffer {out_dir}: appending episodes "
                f"{start_key}..{src_len - 1}"
            )
        else:
            logger.info(
                f"featurized buffer {out_dir} is stale (frozen weights or "
                "MAX_INSTRUCTION_LEN changed, or source shrank); rebuilding"
            )
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
    n_new = featurize_buffer(
        config.MODEL, compute_dtype, params, extra, raw_dir, out_dir,
        start_key=start_key, max_instruction_len=max_len,
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump(
            {"fingerprint": fp, "episodes": start_key + n_new,
             "source": raw_dir, "max_instruction_len": max_len}, f,
        )
    logger.info(
        f"featurized {n_new} episodes ({start_key + n_new} total) -> {out_dir}"
    )
    return out_dir
