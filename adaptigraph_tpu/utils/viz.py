"""Visualization: graph projection overlays, rollout videos, error plots.

Plays the role of the reference's rollout/planning visualization
(reference: ``src/dynamics/rollout/graph.py:59-339`` ``visualize_graph``
pred/gt/both jpgs + mp4s, ``src/planning/plan_utils.py:104-281``
``visualize_img``, error plots at ``rollout.py:349-355,438-467`` and loss
curves at ``train.py:144-157``). cv2 draws, imageio writes videos.
"""

import os

import numpy as np


def project_points(points, intr, extr):
    """World points -> pixel coords through a pinhole camera.

    intr: (fx, fy, cx, cy); extr: (4, 4) world->camera matrix
    (reference: rollout/graph.py:42-57 projection math).
    """
    pts = np.asarray(points, np.float64)
    ones = np.ones((len(pts), 1))
    pc = (np.concatenate([pts, ones], axis=1) @ np.asarray(extr).T)[:, :3]
    fx, fy, cx, cy = intr
    z = np.maximum(pc[:, 2], 1e-9)
    u = pc[:, 0] / z * fx + cx
    v = pc[:, 1] / z * fy + cy
    return np.stack([u, v], axis=1), pc[:, 2]


def draw_graph(img, points, intr, extr, neighbors=None, nbr_mask=None,
               color=(0, 255, 0), edge_color=(0, 180, 255), radius=3):
    """Overlay projected particles (+ optionally the neighbor graph edges)
    on an image (reference: rollout/graph.py:175-250)."""
    import cv2

    img = np.ascontiguousarray(img)
    uv, z = project_points(points, intr, extr)
    ok = z > 0
    if neighbors is not None:
        nb = np.asarray(neighbors)
        mk = np.asarray(nbr_mask) if nbr_mask is not None else np.ones(nb.shape, bool)
        for i in range(nb.shape[0]):
            if not ok[i]:
                continue
            for k in range(nb.shape[1]):
                j = int(nb[i, k])
                if not mk[i, k] or j >= len(uv) or not ok[j]:
                    continue
                cv2.line(img, tuple(np.round(uv[i]).astype(int)),
                         tuple(np.round(uv[j]).astype(int)), edge_color, 1)
    for i in range(len(uv)):
        if ok[i]:
            cv2.circle(img, tuple(np.round(uv[i]).astype(int)), radius, color, -1)
    return img


def render_rollout_frames(pred_seq, gt_seq, intr, extr, img_size=(360, 360),
                          n_valid=None):
    """Side-by-side pred | gt | both frames for a rollout
    (reference: rollout/graph.py:59-339 pred/gt/both jpg triplets)."""
    frames = []
    n = n_valid if n_valid is not None else pred_seq.shape[1]
    for t in range(len(pred_seq)):
        canvas = np.full((img_size[0], img_size[1] * 3, 3), 255, np.uint8)
        pred_img = draw_graph(canvas[:, : img_size[1]].copy(), pred_seq[t][:n],
                              intr, extr, color=(0, 0, 255))
        gt_img = draw_graph(canvas[:, img_size[1] : 2 * img_size[1]].copy(),
                            gt_seq[t][:n], intr, extr, color=(0, 255, 0))
        both = draw_graph(canvas[:, 2 * img_size[1] :].copy(), gt_seq[t][:n],
                          intr, extr, color=(0, 255, 0))
        both = draw_graph(both, pred_seq[t][:n], intr, extr, color=(0, 0, 255))
        canvas[:, : img_size[1]] = pred_img
        canvas[:, img_size[1] : 2 * img_size[1]] = gt_img
        canvas[:, 2 * img_size[1] :] = both
        frames.append(canvas)
    return frames


def save_video(frames, path, fps=10):
    """mp4 via cv2.VideoWriter, falling back to gif via imageio when no mp4
    codec is available (reference merges jpgs with moviepy/cv2,
    ``src/dynamics/utils.py:97-126``)."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if vw.isOpened():
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        if os.path.getsize(path) > 0:
            return path
    import imageio.v2 as imageio

    gif = os.path.splitext(path)[0] + ".gif"
    imageio.mimsave(gif, frames, fps=fps)
    return gif


def topdown_camera(scale=60.0, center=(0.0, 0.0), img_size=(360, 360), height=12.0):
    """A simple top-down (y-up sim frame) camera for rollout videos."""
    fx = fy = scale
    cx, cy = img_size[1] / 2.0, img_size[0] / 2.0
    # world->camera: looking straight down -y; camera z = height - y
    extr = np.array([
        [1.0, 0.0, 0.0, -center[0]],
        [0.0, 0.0, 1.0, -center[1]],
        [0.0, -1.0, 0.0, height],
        [0.0, 0.0, 0.0, 1.0],
    ])
    return np.array([fx, fy, cx, cy]), extr


def plot_error_curves(stats, path, title="rollout error"):
    """Median/IQR error-vs-step plot (reference: rollout.py:438-467)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    med, q25, q75 = stats["median"], stats["q25"], stats["q75"]
    steps = np.arange(len(med))
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(steps, med, label="median")
    ax.fill_between(steps, q25, q75, alpha=0.3, label="IQR")
    ax.set_xlabel("rollout step")
    ax.set_ylabel("mean particle L2 error")
    ax.set_title(title)
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_planning_progress(errors, path, title="planning error vs target"):
    """Per-MPC-step error curve (reference: plan.py stats dumps)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.arange(len(errors)), errors, marker="o")
    ax.set_xlabel("MPC step")
    ax.set_ylabel("error to target")
    ax.set_title(title)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
