"""Score/ROC/latent plotting (reference utils/eval_utils.py:216-230 ROC PNGs
and the latent-sphere / anomaly-score-per-person plots of
visualize/visualize.ipynb)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..score.auc import roc_auc_score, roc_curve


def plot_roc(y_true: np.ndarray, y_score: np.ndarray, path: str = "") -> float:
    """ROC curve with the TPR = 1 - FPR crossing marked; saves a PNG when a
    path is given. Returns the AUC."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fpr, tpr, _ = roc_curve(y_true, y_score)
    auc = roc_auc_score(y_true, y_score)
    idx = np.argwhere(np.diff(np.sign(tpr - (1 - fpr)))).flatten()

    fig, ax = plt.subplots()
    ax.plot(fpr, tpr, label=f"AUC={auc:.4f}")
    ax.plot(fpr, 1 - fpr, "r:")
    ax.plot(fpr[idx], tpr[idx], "ro")
    ax.set_xlabel("FPR")
    ax.set_ylabel("TPR")
    ax.legend(loc=4)
    ax.grid(True)
    if path:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        fig.savefig(path)
    plt.close(fig)
    return auc


def plot_scores(
    scores: np.ndarray,
    gt: Optional[np.ndarray] = None,
    path: str = "",
    title: str = "anomaly score",
    per_actor: Optional[Dict[int, np.ndarray]] = None,
):
    """Per-frame anomaly score curve with ground-truth shading; optional
    per-actor curves underneath."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_rows = 1 + (1 if per_actor else 0)
    fig, axes = plt.subplots(n_rows, 1, figsize=(10, 3 * n_rows), squeeze=False)
    ax = axes[0][0]
    ax.plot(scores, color="tab:blue", linewidth=1)
    if gt is not None:
        ax.fill_between(
            np.arange(len(gt)), 0, np.max(scores) if len(scores) else 1,
            where=np.asarray(gt, bool), alpha=0.2, color="red",
            label="ground truth",
        )
        ax.legend()
    ax.set_title(title)
    ax.set_xlabel("frame")
    if per_actor:
        ax2 = axes[1][0]
        for actor, row in per_actor.items():
            ax2.plot(row, linewidth=0.8, label=f"actor {actor}")
        ax2.legend(fontsize=7)
        ax2.set_title("per-actor scores")
    fig.tight_layout()
    if path:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        fig.savefig(path)
    plt.close(fig)


def plot_latents(
    latents: np.ndarray,
    labels: Optional[np.ndarray] = None,
    center: Optional[np.ndarray] = None,
    path: str = "",
    three_d: bool = True,
    title: str = "latent space",
):
    """Latent-space scatter (3D when the geometry is spherical/3D-projected,
    else 2D), colored by anomaly labels, with the center marked — the
    latent-sphere plots of the reference's analysis notebook
    (visualize/visualize.ipynb). Dimensions above 3 are PCA-projected."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    z = np.asarray(latents, np.float64)
    c = None if center is None else np.asarray(center, np.float64)
    d = min(3 if three_d else 2, z.shape[1])
    if z.shape[1] > d:
        mu = z.mean(0)
        zc = z - mu
        _, _, vt = np.linalg.svd(zc, full_matrices=False)
        z = zc @ vt[:d].T
        if c is not None:
            c = (c - mu) @ vt[:d].T
    colors = None
    if labels is not None:
        colors = np.where(np.asarray(labels) > 0, "crimson", "steelblue")

    fig = plt.figure(figsize=(6, 6))
    if d == 3:
        ax = fig.add_subplot(111, projection="3d")
        ax.scatter(z[:, 0], z[:, 1], z[:, 2], s=4, c=colors, alpha=0.6)
        if c is not None:
            ax.scatter([c[0]], [c[1]], [c[2]], s=120, marker="*", c="black",
                       label="center")
            ax.legend()
    else:
        ax = fig.add_subplot(111)
        ax.scatter(z[:, 0], z[:, 1], s=4, c=colors, alpha=0.6)
        if c is not None:
            ax.scatter([c[0]], [c[1]], s=120, marker="*", c="black", label="center")
            ax.legend()
    ax.set_title(title)
    if path:
        import os

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        fig.savefig(path)
    plt.close(fig)


def per_clip_auc_table(
    per_clip_auc: dict, fmt: str = "markdown", sort_by: str = "auc"
) -> str:
    """Render {(scene, clip): auc} as a markdown or LaTeX table — the
    analysis the reference keeps in its notebook's HR-UBnormal stats cell
    (visualize/visualize.ipynb).

    Args:
        per_clip_auc: e.g. EvalResult.per_clip_auc from score.aggregate.
        fmt: 'markdown' or 'latex'.
        sort_by: 'auc' (ascending — worst clips first) or 'clip'.
    """
    items = sorted(
        per_clip_auc.items(),
        key=(lambda kv: kv[1]) if sort_by == "auc" else (lambda kv: kv[0]),
    )
    rows = [(f"{s}_{c}", f"{auc:.4f}") for (s, c), auc in items]
    if fmt == "latex":
        lines = [
            r"\begin{tabular}{lr}", r"\toprule",
            r"clip & AUC \\", r"\midrule",
            *[f"{name} & {auc} \\\\" for name, auc in rows],
            r"\bottomrule", r"\end{tabular}",
        ]
        return "\n".join(lines)
    if fmt != "markdown":
        raise ValueError(f"unknown fmt {fmt!r}")
    return "\n".join(["| clip | AUC |", "|---|---|",
                      *[f"| {name} | {auc} |" for name, auc in rows]])
