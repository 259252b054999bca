"""Headless BEV rendering of detection results (matplotlib Agg).

The reference's ``--show``/``--show-dir`` (tools/test.py:43-45) and
``tools/misc/visualize_results.py`` render predictions with the mmdet3d
Open3D/mlab visualizer, which needs a display and the raw dataset.  This
analog draws the standard top-down (bird's-eye-view) box plot straight
from a nuScenes submission json — rotated rectangles with heading ticks
and velocity arrows, per-class colors, score-gated — and writes PNGs, so
it runs anywhere the results file exists.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from transcar_tpu.core.config import CLASS_NAMES, PC_RANGE

_COLORS = {
    "car": "#1f77b4", "truck": "#ff7f0e", "trailer": "#2ca02c",
    "bus": "#d62728", "construction_vehicle": "#9467bd",
    "bicycle": "#8c564b", "motorcycle": "#e377c2", "pedestrian": "#7f7f7f",
    "traffic_cone": "#bcbd22", "barrier": "#17becf",
}


def _box_corners_bev(x, y, w, l, yaw):
    """[4, 2] footprint corners of a (gravity-center) box in ego frame."""
    dx, dy = l / 2.0, w / 2.0
    local = np.array([[dx, dy], [dx, -dy], [-dx, -dy], [-dx, dy]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def render_bev(annos: List[Dict], out_png: str,
               pc_range=PC_RANGE, score_thr: float = 0.3,
               title: Optional[str] = None) -> int:
    """Draw one sample's detections top-down; returns #boxes drawn.

    ``annos``: submission-json records (translation [global or ego],
    size wlh, rotation quat, velocity, detection_name/score).  Boxes are
    drawn around their mean center so global-frame submissions stay
    in-frame.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    kept = [a for a in annos if a["detection_score"] >= score_thr]
    fig, ax = plt.subplots(figsize=(8, 8))
    half = (pc_range[3] - pc_range[0]) / 2.0
    if kept:
        centers = np.array([a["translation"][:2] for a in kept])
        origin = centers.mean(axis=0)
    else:
        origin = np.zeros(2)

    from transcar_tpu.data.export2d import quat_yaw

    for a in kept:
        x, y = np.asarray(a["translation"][:2]) - origin
        w, l = a["size"][0], a["size"][1]
        yaw = quat_yaw(a["rotation"])
        cor = _box_corners_bev(x, y, w, l, yaw)
        color = _COLORS.get(a["detection_name"], "#000000")
        alpha = min(1.0, 0.25 + 0.75 * a["detection_score"])
        ax.fill(cor[:, 0], cor[:, 1], facecolor="none", edgecolor=color,
                alpha=alpha, linewidth=1.2)
        # heading tick from center to front-mid
        front = (cor[0] + cor[1]) / 2.0
        ax.plot([x, front[0]], [y, front[1]], color=color, alpha=alpha,
                linewidth=1.0)
        vel = a.get("velocity", [0, 0])
        if abs(vel[0]) + abs(vel[1]) > 0.2:
            ax.arrow(x, y, vel[0], vel[1], color=color, alpha=alpha,
                     width=0.05, head_width=0.6, length_includes_head=True)
    ax.plot(0, 0, marker="^", color="black", markersize=8)   # ego
    ax.set_xlim(-half, half)
    ax.set_ylim(-half, half)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    if title:
        ax.set_title(title, fontsize=9)
    handles = [plt.Line2D([0], [0], color=c, label=n)
               for n, c in _COLORS.items() if n in CLASS_NAMES]
    ax.legend(handles=handles, fontsize=6, loc="upper right")
    fig.savefig(out_png, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return len(kept)


def render_submission(results_json: str, out_dir: str,
                      score_thr: float = 0.3,
                      max_samples: Optional[int] = None) -> List[str]:
    """Render every sample of a submission json into ``out_dir``."""
    with open(results_json) as f:
        sub = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, (token, annos) in enumerate(sub["results"].items()):
        if max_samples is not None and i >= max_samples:
            break
        out = os.path.join(out_dir, f"{i:04d}_{token[:16]}.png")
        n = render_bev(annos, out, score_thr=score_thr,
                       title=f"{token} ({len(annos)} dets)")
        written.append(out)
        if i < 3 or n:
            print(f"rendered {out} ({n} boxes ≥{score_thr})")
    return written
