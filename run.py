#!/usr/bin/env python3
"""Experiment CLI (reference run.py equivalent).

    python run.py --exp-config robo_vln_tpu/config/configs/<exp>.yaml \
        --run-type {train,eval} [OPT.KEY value ...]

Dispatches to the registered trainer's .train()/.eval(), or to the
nonlearning-agent evaluation when EVAL.EVAL_NONLEARNING is set
(reference run.py:17-73).
"""

import argparse
import random

import numpy as np

import robo_vln_tpu.training.hierarchical_trainer  # noqa: F401 (registers)
import robo_vln_tpu.training.trainer  # noqa: F401 (registers)
from robo_vln_tpu.config.default import get_config
from robo_vln_tpu.utils.logging import add_filehandler, logger
from robo_vln_tpu.utils.registry import get_trainer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--run-type", choices=["train", "eval"], required=True,
        help="run type of the experiment (train, eval)",
    )
    parser.add_argument(
        "--exp-config", type=str, required=True,
        help="path to config yaml containing info about experiment",
    )
    parser.add_argument(
        "opts", default=None, nargs=argparse.REMAINDER,
        help="Modify config options from command line",
    )
    args = parser.parse_args()
    run_exp(**vars(args))


def run_exp(exp_config: str, run_type: str, opts=None) -> None:
    config = get_config(exp_config, opts)
    logger.info(f"config: {config.dump_yaml()}")
    add_filehandler(config.LOG_FILE)

    random.seed(config.TASK_CONFIG.SEED)
    np.random.seed(config.TASK_CONFIG.SEED)

    if run_type == "eval" and config.EVAL.EVAL_NONLEARNING:
        from robo_vln_tpu.agents.nonlearning import evaluate_agent

        evaluate_agent(config)
        return

    trainer_cls = get_trainer(config.TRAINER_NAME)
    trainer = trainer_cls(config)
    if run_type == "train":
        trainer.train()
    else:
        trainer.eval()


if __name__ == "__main__":
    main()
