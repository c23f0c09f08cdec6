"""Visualization utilities (host-side).

Equivalents of habitat_extensions/utils.py:10-71 (`observations_to_image`
tiles RGB + colorized depth + the top-down map with the agent drawn in) and
habitat's `images_to_video`/`generate_video` (VIDEO_OPTION "disk" and
"tensorboard" branches, robo_vln_trainer.py:1226-1239), plus
`append_text_to_image` for instruction overlays.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def draw_agent(image: np.ndarray, coord, angle: float,
               radius_px: int) -> np.ndarray:
    """Draw the agent as a filled circle + heading tick (stand-in for
    habitat maps.draw_agent, used by reference utils.py:48-54)."""
    import cv2

    r, c = int(coord[0]), int(coord[1])
    cv2.circle(image, (c, r), max(radius_px, 2), (40, 40, 40), -1)
    tip = (
        int(c + 2 * radius_px * np.sin(angle)),
        int(r - 2 * radius_px * np.cos(angle)),
    )
    cv2.line(image, (c, r), tip, (40, 40, 40), max(radius_px // 2, 1))
    return image


def topdown_map_tile(info: Dict, height: int) -> Optional[np.ndarray]:
    """Colorized top-down map scaled to the egocentric view height
    (reference observations_to_image, habitat_extensions/utils.py:44-70)."""
    import cv2

    td = info.get("top_down_map") if info else None
    if not td:
        return None
    top_down_map = np.array(td["map"], copy=True)
    top_down_map = draw_agent(
        top_down_map, td["agent_map_coord"], td.get("agent_angle", 0.0),
        radius_px=top_down_map.shape[0] // 16,
    )
    if top_down_map.shape[0] > top_down_map.shape[1]:
        top_down_map = np.rot90(top_down_map, 1).copy()
    old_h, old_w, _ = top_down_map.shape
    width = int(float(height) / old_h * old_w)
    return cv2.resize(
        top_down_map, (width, height), interpolation=cv2.INTER_CUBIC
    )


def observations_to_image(observation: Dict, info: Optional[Dict] = None) -> np.ndarray:
    """Tile rgb + resized depth (+ top-down map when measured) into one frame."""
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
    frame = np.concatenate(views, axis=1)
    map_tile = topdown_map_tile(info, frame.shape[0])
    if map_tile is not None:
        frame = np.concatenate([frame, map_tile], axis=1)
    return frame


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
    """Both reference VIDEO_OPTION branches (habitat generate_video): "disk"
    writes an mp4, "tensorboard" logs the frames through the writer."""
    if not video_option or not images:
        return
    metric_str = "-".join(f"{k}={v:.2f}" for k, v in metrics.items())
    name = f"episode={episode_id}-ckpt={checkpoint_idx}-{metric_str}"
    if "disk" in video_option:
        images_to_video(images, video_dir, name, fps=fps)
    if "tensorboard" in video_option and tb_writer is not None:
        tb_writer.add_video(
            f"episode{episode_id}", images, checkpoint_idx, fps=min(fps, 10)
        )
