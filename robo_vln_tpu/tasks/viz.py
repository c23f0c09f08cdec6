"""Visualization utilities (host-side).

Equivalents of habitat_extensions/utils.py:10-71 (`observations_to_image`
tiles RGB + colorized depth) and habitat's `images_to_video`/`generate_video`
(used by the eval loops when VIDEO_OPTION is set, robo_vln_trainer.py:
1226-1239), plus `append_text_to_image` for instruction overlays.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def observations_to_image(observation: Dict, info: Optional[Dict] = None) -> np.ndarray:
    """Tile rgb + resized depth into one frame."""
    import cv2

    views = []
    size = -1
    if "rgb" in observation:
        rgb = np.asarray(observation["rgb"])[..., :3].astype(np.uint8)
        size = rgb.shape[0]
        views.append(rgb)
    if "depth" in observation:
        depth = np.asarray(observation["depth"]).squeeze()
        if size == -1:
            size = depth.shape[0]
        dm = (np.clip(depth, 0, 1) * 255).astype(np.uint8)
        dm = np.stack([dm] * 3, axis=2)
        dm = cv2.resize(dm, (size, size), interpolation=cv2.INTER_CUBIC)
        views.append(dm)
    assert views, "need at least one visual sensor"
    return np.concatenate(views, axis=1)


def append_text_to_image(image: np.ndarray, text: str) -> np.ndarray:
    import cv2

    h, w = image.shape[:2]
    pad = 50
    canvas = np.zeros((h + pad, w, 3), np.uint8)
    canvas[:h] = image
    cv2.putText(
        canvas, text[:80], (5, h + 30), cv2.FONT_HERSHEY_SIMPLEX, 0.4,
        (255, 255, 255), 1,
    )
    return canvas


def images_to_video(images: List[np.ndarray], output_dir: str, video_name: str,
                    fps: int = 30) -> str:
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{video_name}.mp4")
    h, w = images[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), max(fps, 1), (w, h)
    )
    for im in images:
        writer.write(cv2.cvtColor(im, cv2.COLOR_RGB2BGR))
    writer.release()
    return path


def generate_video(video_option: List[str], video_dir: str,
                   images: List[np.ndarray], episode_id, checkpoint_idx: int,
                   metrics: Dict[str, float], tb_writer=None, fps: int = 30):
    if not video_option or not images:
        return
    metric_str = "-".join(f"{k}={v:.2f}" for k, v in metrics.items())
    name = f"episode={episode_id}-ckpt={checkpoint_idx}-{metric_str}"
    if "disk" in video_option:
        images_to_video(images, video_dir, name, fps=fps)
