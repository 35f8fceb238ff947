"""COSKAD-TPU: a TPU-native JAX/XLA/Pallas framework for skeleton-based
one-class video anomaly detection.

Re-implements the full capability surface of COSKAD ("Contracting Skeletal
Kinematics for Human-Related Video Anomaly Detection", Pattern Recognition
156, 2024; reference implementation aleflabo/COSKAD) as an idiomatic
TPU-first framework:

- space-time-separable graph convolutional encoders run as batched XLA/Pallas
  matmul kernels (reference: models/graph_layers/stsgcn.py),
- four latent geometries (Euclidean static/dynamic center, Euclidean
  autoencoder, spherical VAE with PowerSpherical latents, hyperbolic
  Poincare-ball encoder) trained with the one-class center-contraction
  objective (reference: models/*.py Lightning modules),
- the sliding-window pose preprocessing becomes a device-side pipeline over
  HBM-resident keypoint tensors (reference: utils/dataset.py, dataset_utils.py),
- data parallelism via jax.sharding.Mesh + shard_map with exact global
  (pmean) center computation instead of per-rank DDP centers.
"""

__version__ = "0.1.0"
