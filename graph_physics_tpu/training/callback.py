"""Prediction visualization: per-epoch screenshots + rollout animation.

Spec: graphphysics/training/callback.py:16-209 (LogPyVistaPredictionsCallback):
render prediction vs ground-truth fields on the mesh at selected frames and
assemble a rollout animation, logged to wandb when available. pyvista is
not in this image — matplotlib triangulation rendering replaces it (same
artifacts: PNG per index + GIF/MP4 per epoch, logged as wandb images/video
when a run is attached, always saved to disk).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def _tri(pos: np.ndarray, faces: Optional[np.ndarray]):
    import matplotlib.tri as mtri

    if faces is not None and faces.shape[1] == 3:
        return mtri.Triangulation(pos[:, 0], pos[:, 1], faces)
    return mtri.Triangulation(pos[:, 0], pos[:, 1])


def render_field_comparison(
    pos: np.ndarray,
    faces: Optional[np.ndarray],
    predicted: np.ndarray,
    target: np.ndarray,
    path: str,
    title: str = "",
    component: int = 0,
):
    """Side-by-side prediction / target / error heatmaps → PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tri = _tri(pos, faces)
    p = predicted[:, component] if predicted.ndim > 1 else predicted
    t = target[:, component] if target.ndim > 1 else target
    vmin, vmax = float(min(p.min(), t.min())), float(max(p.max(), t.max()))

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ax, (data, name) in zip(
        axes,
        [(p, "prediction"), (t, "target"), (np.abs(p - t), "abs error")],
    ):
        kwargs = {} if name == "abs error" else {"vmin": vmin, "vmax": vmax}
        m = ax.tripcolor(tri, data, shading="gouraud", **kwargs)
        ax.set_title(f"{title} {name}")
        ax.set_aspect("equal")
        fig.colorbar(m, ax=ax, shrink=0.8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return path


def render_rollout_animation(
    pos: np.ndarray,
    faces: Optional[np.ndarray],
    predictions: np.ndarray,  # [T, N, F]
    targets: np.ndarray,
    path: str,
    component: int = 0,
    fps: int = 10,
    max_frames: int = 120,
):
    """Rollout animation (prediction vs target) → GIF."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as manim
    import matplotlib.pyplot as plt

    tri = _tri(pos, faces)
    t_idx = np.linspace(
        0, len(predictions) - 1, min(len(predictions), max_frames)
    ).astype(int)
    vmin = float(targets[..., component].min())
    vmax = float(targets[..., component].max())

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    for ax in (ax1, ax2):
        ax.set_aspect("equal")
    m1 = ax1.tripcolor(tri, predictions[0][:, component], shading="gouraud", vmin=vmin, vmax=vmax)
    m2 = ax2.tripcolor(tri, targets[0][:, component], shading="gouraud", vmin=vmin, vmax=vmax)
    ax1.set_title("prediction")
    ax2.set_title("target")

    def update(i):
        m1.set_array(predictions[t_idx[i]][:, component])
        m2.set_array(targets[t_idx[i]][:, component])
        return m1, m2

    anim = manim.FuncAnimation(fig, update, frames=len(t_idx), blit=False)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    anim.save(path, writer=manim.PillowWriter(fps=fps))
    plt.close(fig)
    return path


class PredictionVisualizer:
    """Epoch-end hook: screenshots of chosen frames + rollout animation.

    Wire into Trainer via ``on_validation_end(result, frames, epoch)``.
    """

    def __init__(
        self,
        out_dir: str,
        indices: Sequence[int] = (0,),
        make_animation: bool = True,
        wandb_run=None,
    ):
        self.out_dir = out_dir
        self.indices = list(indices)
        self.make_animation = make_animation
        self.wandb = wandb_run

    def __call__(self, rollout_result, frames, epoch: int) -> List[str]:
        n = int(np.asarray(frames.n_node)[0])
        pos = np.asarray(frames.pos[0])[:n]
        faces = None
        if frames.faces is not None:
            c = int(np.sum(np.asarray(frames.face_mask[0])))
            faces = np.asarray(frames.faces[0])[:c]
        preds = np.asarray(rollout_result.predictions)[:, :n]
        targs = np.asarray(rollout_result.targets)[:, :n]
        artifacts = []
        for i in self.indices:
            if i >= len(preds):
                continue
            p = os.path.join(self.out_dir, f"epoch_{epoch}_frame_{i}.png")
            artifacts.append(
                render_field_comparison(pos, faces, preds[i], targs[i], p, title=f"t={i}")
            )
        if self.make_animation:
            p = os.path.join(self.out_dir, f"epoch_{epoch}_rollout.gif")
            artifacts.append(render_rollout_animation(pos, faces, preds, targs, p))
        if self.wandb is not None:
            try:
                import wandb

                logs = {
                    f"val/frame_{i}": wandb.Image(a)
                    for i, a in zip(self.indices, artifacts)
                }
                if self.make_animation:
                    logs["val/rollout"] = wandb.Video(artifacts[-1])
                self.wandb.log(logs)
            except Exception:
                pass
        return artifacts
