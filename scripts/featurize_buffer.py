#!/usr/bin/env python3
"""Pre-extract frozen-trunk features for a trajectory buffer (the
DAGGER.PRELOAD_TRUNK_FEATURES cache) without launching training.

    python scripts/featurize_buffer.py \
        --exp-config robo_vln_tpu/config/configs/hierarchical_cma.yaml \
        [--buffer data/trajectories_dirs/.../trajectories.store] \
        [OPT.KEY value ...]

Builds the policy for the config (grafting the pretrained trunks), then
writes/refreshes `<buffer>.features` via training.featurize.ensure_featurized
(fingerprint-keyed: re-running with unchanged weights is a no-op).  Defaults
to the config's DAGGER.LMDB_FEATURES_DIR; pass --buffer for any other store
(e.g. the eval buffer).
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp-config", required=True)
    parser.add_argument("--buffer", default="",
                        help="trajectory store dir (default: the config's "
                             "DAGGER.LMDB_FEATURES_DIR for the train split)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax

    import robo_vln_tpu.training.hierarchical_trainer  # noqa: F401 (registers)
    import robo_vln_tpu.training.trainer  # noqa: F401 (registers)
    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.models import resolve_dtype
    from robo_vln_tpu.training.featurize import ensure_featurized
    from robo_vln_tpu.utils.logging import logger
    from robo_vln_tpu.utils.registry import get_trainer

    config = get_config(args.exp_config, args.opts or None)
    trainer = get_trainer(config.TRAINER_NAME)(config)
    trainer._setup_policy()
    buffer_dir = args.buffer or trainer.features_dir
    if config.TRAINER_NAME == "hierarchical_trainer":
        from robo_vln_tpu.models import frozen_trunks_identical

        if not frozen_trunks_identical(
            trainer.state.high.params, trainer.state.low.params,
            trainer._high_extra, trainer._low_extra,
        ):
            logger.error(
                "high/low trunk weights differ — features computed with the "
                "high level's trunks would not match the low level; drop the "
                "shared pretrained files first (docs/RUNBOOK.md)"
            )
            return 1
        params, extra = jax.device_get(trainer.state.high.params), trainer._high_extra
    else:
        params, extra = jax.device_get(trainer.state.params), trainer.extra_variables
    out = ensure_featurized(
        config, resolve_dtype(config.TPU.PRECISION), params, extra, buffer_dir
    )
    logger.info(f"feature buffer ready: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
