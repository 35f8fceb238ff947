from .clips import ClipVisualizer, extract_frames
from .plots import (hr_stats_table, plot_latent_sphere, plot_latents,
                    plot_person_scores, plot_roc, plot_scores,
                    ubnormal_original_name)

__all__ = [
    "ClipVisualizer", "extract_frames", "plot_latents", "plot_roc",
    "plot_scores", "plot_latent_sphere", "plot_person_scores",
    "hr_stats_table", "ubnormal_original_name",
]
