from .clips import ClipVisualizer, extract_frames
from .plots import plot_roc, plot_scores

__all__ = ["ClipVisualizer", "extract_frames", "plot_roc", "plot_scores"]
