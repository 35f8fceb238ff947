from .clips import ClipVisualizer, extract_frames
from .plots import plot_latents, plot_roc, plot_scores

__all__ = ["ClipVisualizer", "extract_frames", "plot_latents", "plot_roc", "plot_scores"]
