"""Alternative encoder backbones + the encoder registry.

The reference registers four encoder types on STSE (models/sts/ae.py:14):
'sts_gcn' (default, stsgcn.py), 'st_gcn' (fixed skeleton graph, broken in the
reference snapshot — rebuilt here from intent, SURVEY.md section 0.1),
'learnable_gcn' and 'static_gcn' (plain GCNs over the flattened T*V node
dimension, graph_layers/{learnable_gcn,gcn}.py). A plain 'cnn' stack exists
unregistered in the reference (alternative_components.py:301-353) and is
registered here for completeness.

All encoders share the channels-last [B, T, V, C] convention and produce
[B, T, V, hidden_dimension].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .graph import build_partitioned_adjacency, build_spacetime_adjacency
from .stsgcn import (
    STSGCNStack,
    _uniform_init,
    torch_bias_init_from_fan,
    torch_linear_kernel_init,
)


class STGCNBlock(nn.Module):
    """One ST-GCN layer (Yan et al.): partitioned graph conv + 9x1 temporal
    conv, residual, ReLU (reference stgcn.py:190-348, with the snapshot's
    constructor bugs fixed)."""

    out_channels: int
    n_partitions: int
    temporal_kernel: int = 9
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, adj, train: bool = False, frozen_bn: bool = False):
        # x: [B, T, V, C]; adj: [K, V, V] (already edge-importance weighted)
        use_running = (not train) or frozen_bn
        in_channels = x.shape[-1]
        if in_channels == self.out_channels:
            res = x
        else:
            res = nn.Dense(
                self.out_channels,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_bias_init_from_fan(in_channels),
                name="residual_dense",
            )(x)
            res = nn.BatchNorm(
                use_running_average=use_running, momentum=0.9, epsilon=1e-5,
                name="residual_bn",
            )(res)

        # Graph conv: 1x1 conv to K * C_out channels, then the partitioned
        # spatial contraction einsum (reference stgcn.py:216-225).
        h = nn.Dense(
            self.out_channels * self.n_partitions,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_bias_init_from_fan(in_channels),
            name="gcn_dense",
        )(x)
        b, t, v, _ = h.shape
        h = h.reshape(b, t, v, self.n_partitions, self.out_channels)
        h = jnp.einsum("btvkc,kvw->btwc", h, adj)

        # Temporal unit: BN -> ReLU -> 9x1 conv over T -> BN -> dropout
        # (reference stgcn.py:300-315).
        h = nn.BatchNorm(
            use_running_average=use_running, momentum=0.9, epsilon=1e-5, name="bn1"
        )(h)
        h = nn.relu(h)
        pad = (self.temporal_kernel - 1) // 2
        h = nn.Conv(
            self.out_channels,
            kernel_size=(self.temporal_kernel, 1),
            padding=((pad, pad), (0, 0)),
            name="tconv",
        )(h)
        h = nn.BatchNorm(
            use_running_average=use_running, momentum=0.9, epsilon=1e-5, name="bn2"
        )(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.relu(h + res)


class STGCNEncoder(nn.Module):
    """Fixed-skeleton ST-GCN encoder with per-layer edge-importance masks and
    the input BatchNorm over (V * C) features (reference
    alternative_components.py:14-102)."""

    layer_channels: Sequence[int]
    hidden_dimension: int
    n_joints: int = 17
    layout: str = "openpose"
    strategy: str = "spatial"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        adj_np = build_partitioned_adjacency(self.layout, self.strategy)
        assert adj_np.shape[1] == x.shape[2], (
            f"graph layout {self.layout} has {adj_np.shape[1]} joints, "
            f"input has {x.shape[2]}"
        )
        adj = jnp.asarray(adj_np, jnp.float32)

        # Input normalization over per-(joint, channel) features.
        b, t, v, c = x.shape
        h = nn.BatchNorm(
            use_running_average=(not train) or frozen_bn, momentum=0.9,
            epsilon=1e-5, name="data_bn",
        )(x.reshape(b, t, v * c)).reshape(b, t, v, c)

        schedule = list(self.layer_channels) + [self.hidden_dimension]
        for i, ch in enumerate(schedule):
            importance = self.param(
                f"edge_importance_{i}",
                lambda *_: jnp.ones(adj.shape, jnp.float32),
            )
            h = STGCNBlock(
                out_channels=ch,
                n_partitions=adj.shape[0],
                dropout=self.dropout,
                name=f"layer_{i}",
            )(h, adj * importance, train=train, frozen_bn=frozen_bn)
        return h


class PlainGCNLayer(nn.Module):
    """X @ W then Adj @ X over flattened T*V nodes, + bias, ReLU
    (reference graph_layers/gcn.py:8-97)."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, adj):
        # x: [B, N, C]; adj: [N, N]
        in_channels = x.shape[-1]
        w = self.param(
            "weight", _uniform_init(1.0 / self.out_channels**0.5),
            (in_channels, self.out_channels),
        )
        h = jnp.einsum("bnc,cd->bnd", x, w)
        h = jnp.einsum("nm,bmd->bnd", adj, h)
        if self.use_bias:
            bias = self.param(
                "bias", _uniform_init(1.0 / self.out_channels**0.5),
                (self.out_channels,),
            )
            h = h + bias
        return nn.relu(h)


class LearnablePlainGCNEncoder(nn.Module):
    """Plain GCN whose T*V x T*V adjacency is a learnable parameter passed
    through a row softmax each forward (reference
    graph_layers/learnable_gcn.py, alternative_components.py:122-181)."""

    layer_channels: Sequence[int]
    hidden_dimension: int
    n_frames: int
    n_joints: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        b, t, v, c = x.shape
        h = x.reshape(b, t * v, c)
        n = t * v
        schedule = list(self.layer_channels) + [self.hidden_dimension]
        for i, ch in enumerate(schedule):
            adj = self.param(
                f"adj_{i}",
                lambda key, shape: jax.random.uniform(key, shape),
                (n, n),
            )
            adj = jax.nn.softmax(adj, axis=-1)
            h = PlainGCNLayer(ch, self.use_bias, name=f"layer_{i}")(h, adj)
        return h.reshape(b, t, v, -1)


class StaticPlainGCNEncoder(nn.Module):
    """Plain GCN over a fixed row-normalized space-time adjacency
    (skeleton bones + self loops + temporal chains; reference
    alternative_components.py:185-297)."""

    layer_channels: Sequence[int]
    hidden_dimension: int
    n_frames: int
    n_joints: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        b, t, v, c = x.shape
        adj = jnp.asarray(build_spacetime_adjacency(t, v))
        h = x.reshape(b, t * v, c)
        schedule = list(self.layer_channels) + [self.hidden_dimension]
        for i, ch in enumerate(schedule):
            h = PlainGCNLayer(ch, self.use_bias, name=f"layer_{i}")(h, adj)
        return h.reshape(b, t, v, -1)


class CNNEncoder(nn.Module):
    """Plain 1x1 conv + BN + dropout stack (reference
    alternative_components.py:301-353; unregistered there)."""

    layer_channels: Sequence[int]
    hidden_dimension: int
    dropout: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        schedule = list(self.layer_channels) + [self.hidden_dimension]
        for i, ch in enumerate(schedule):
            fan_in = x.shape[-1]
            x = nn.Dense(
                ch,
                use_bias=self.use_bias,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_bias_init_from_fan(fan_in),
                name=f"dense_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=(not train) or frozen_bn, momentum=0.9,
                epsilon=1e-5, name=f"bn_{i}",
            )(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def make_encoder(
    encoder_type: str,
    layer_channels: Sequence[int],
    hidden_dimension: int,
    n_frames: int,
    n_joints: int,
    dropout: float,
    use_bias: bool,
    dtype=jnp.float32,
    bn_mode: str = "auto",
    name: str = "encoder",
):
    """Encoder registry (reference models/sts/ae.py:14,124-142).

    bn_mode applies to the sts_gcn stack only (the flagship hot path); the
    alternative encoders keep plain flax BN — their BN inputs are either
    the flattened T*V node axis (plain GCNs, where the moment matrix would
    be [T*V, T*V]-sized) or conv features the fold doesn't apply to.
    """
    et = encoder_type.lower()
    if et == "sts_gcn":
        return STSGCNStack(
            channel_schedule=list(layer_channels) + [hidden_dimension],
            time_dim=n_frames,
            joints_dim=n_joints,
            dropout=dropout,
            use_bias=use_bias,
            dtype=dtype,
            bn_mode=bn_mode,
            name=name,
        )
    if et == "st_gcn":
        return STGCNEncoder(
            layer_channels=layer_channels,
            hidden_dimension=hidden_dimension,
            n_joints=n_joints,
            dropout=dropout,
            name=name,
        )
    if et == "learnable_gcn":
        return LearnablePlainGCNEncoder(
            layer_channels=layer_channels,
            hidden_dimension=hidden_dimension,
            n_frames=n_frames,
            n_joints=n_joints,
            use_bias=use_bias,
            name=name,
        )
    if et == "static_gcn":
        return StaticPlainGCNEncoder(
            layer_channels=layer_channels,
            hidden_dimension=hidden_dimension,
            n_frames=n_frames,
            n_joints=n_joints,
            use_bias=use_bias,
            name=name,
        )
    if et == "cnn":
        return CNNEncoder(
            layer_channels=layer_channels,
            hidden_dimension=hidden_dimension,
            dropout=dropout,
            use_bias=use_bias,
            name=name,
        )
    raise ValueError(
        f"Encoder type {encoder_type!r} not supported; choose from "
        "['sts_gcn', 'st_gcn', 'learnable_gcn', 'static_gcn', 'cnn']"
    )
