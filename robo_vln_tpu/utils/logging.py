"""Metrics/observability: TensorBoard-compatible writer + JSONL mirror +
framework logger.

Replaces the reference's habitat TensorboardWriter usage
(robo_vln_trainer.py:893-895,649-652).  Scalars go to TensorBoard when the
`tensorboard` package is present and always to a metrics.jsonl file (greppable
observability without TB).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

logger = logging.getLogger("robo_vln_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def add_filehandler(path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fh = logging.FileHandler(path)
    fh.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    logger.addHandler(fh)


class MetricsWriter:
    def __init__(self, log_dir: str, flush_secs: int = 30):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir, flush_secs=flush_secs)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir=log_dir, flush_secs=flush_secs)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step),
                        "ts": time.time()})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_video(self, tag: str, frames, step: int, fps: int = 10) -> None:
        """Video from a list of HxWx3 uint8 frames (the reference's
        add_video_from_np_images, used by the VIDEO_OPTION "tensorboard"
        branch).  JSONL mirrors the metadata only."""
        import numpy as np

        self._jsonl.write(
            json.dumps({"tag": tag, "video_frames": len(frames),
                        "step": int(step), "ts": time.time()})
            + "\n"
        )
        if self._tb is not None:
            arr = np.stack(frames).transpose(0, 3, 1, 2)[None]  # (1,T,C,H,W)
            try:
                import torch

                arr = torch.from_numpy(arr)
            except ImportError:
                pass  # tensorboardX accepts numpy directly
            try:
                self._tb.add_video(tag, arr, step, fps=fps)
            except Exception as e:  # noqa: BLE001 — video is best-effort
                logger.warning(f"tensorboard video skipped: {e}")

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
