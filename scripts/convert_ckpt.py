#!/usr/bin/env python3
"""Convert a reference PyTorch checkpoint (.pth) to a framework orbax
checkpoint.

    python scripts/convert_ckpt.py --exp-config <exp yaml> \
        --pth data/checkpoints/HCM_Agent.pth \
        --out data/checkpoints/hcm_converted

The output directory is a full orbax train state (fresh optimizer) loadable
by ``run.py --run-type eval EVAL_CKPT_PATH_DIR <out>`` — though eval can also
consume the .pth directly (EVAL_CKPT_PATH_DIR pointing at the .pth file);
this script exists for one-time conversion so repeated evals skip the torch
load.  Reference checkpoint layouts: hierarchical {high_level_state_dict,
low_level_state_dict} (hierarchical_trainer.py:349-363, the published
HCM_Agent.pth, README.md:251-255) and flat {state_dict}
(robo_vln_trainer.py:359-372).
"""

import argparse
import sys


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp-config", required=True,
                        help="experiment yaml matching the checkpoint's model")
    parser.add_argument("--pth", required=True, help="reference .pth path")
    parser.add_argument("--out", required=True,
                        help="output orbax checkpoint directory")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="config overrides (A.B.C value ...)")
    args = parser.parse_args()

    import robo_vln_tpu.training.hierarchical_trainer  # noqa: F401 (registers)
    import robo_vln_tpu.training.trainer  # noqa: F401 (registers)
    from robo_vln_tpu.config.default import get_config
    from robo_vln_tpu.training import checkpoint as ckpt_lib
    from robo_vln_tpu.utils.logging import logger
    from robo_vln_tpu.utils.registry import get_trainer

    config = get_config(args.exp_config, args.opts or None)
    trainer = get_trainer(config.TRAINER_NAME)(config)
    trainer._setup_policy()
    if config.TRAINER_NAME == "hierarchical_trainer":
        counts = ckpt_lib.load_torch_into_hier_trainer(trainer, args.pth)
    else:
        counts = ckpt_lib.load_torch_into_flat_trainer(trainer, args.pth)
    ckpt_lib.save_checkpoint(
        args.out, trainer.state,
        metadata={
            "config": config.to_dict(),
            "converted_from": args.pth,
            "converted_leaves": counts,
        },
    )
    if config.TRAINER_NAME == "hierarchical_trainer":
        ckpt_lib.save_extra_variables(
            args.out, {"high": trainer._high_extra, "low": trainer._low_extra}
        )
    else:
        ckpt_lib.save_extra_variables(args.out, trainer.extra_variables)
    logger.info(f"wrote converted checkpoint -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
