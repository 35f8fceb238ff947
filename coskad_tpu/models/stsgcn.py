"""Space-Time-Separable GCN layers (flax.linen).

TPU-native redesign of the reference's ST-GCNN building block
(models/graph_layers/stsgcn.py:9-156): two learnable dense adjacency
contractions — temporal Tadj[V, T, T] and spatial Aadj[T, V, V] — followed by
a 1x1 convolution (a feature-dim dense layer), BatchNorm, dropout, a residual
1x1 conv when channels change, and PReLU.

Layout: tensors flow through the stack channels-last [B, T, V, C] so the 1x1
conv is a plain matmul on the minor dimension (MXU-friendly) and the graph
contractions are einsums over the small T/V axes that XLA fuses into batched
matmuls; wrappers at the model boundary accept the reference's NCTV layout.
Initialization matches torch semantics (uniform +-1/sqrt(fan) for the
adjacencies, kaiming-uniform-style conv defaults, PReLU alpha 0.25) so
weights can be transplanted for golden parity tests.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear/Conv2d default: kaiming_uniform(a=sqrt(5)) which
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the kernel."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init_from_fan(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5
    return _uniform_init(bound)


class DenseParams(nn.Module):
    """Parameter container producing exactly nn.Dense's variable tree
    (kernel/bias under this module's name) WITHOUT computing the matmul —
    the moment-BN path (see `_moment_dense_bn`) folds the matmul itself.
    Initializers match the nn.Dense calls they replace, and flax derives
    param RNG from (scope path, param name), so a model initialized in
    either bn_mode is bit-identical."""

    features: int
    fan_in: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (self.fan_in, self.features)
        )
        bias = (
            self.param(
                "bias", torch_bias_init_from_fan(self.fan_in), (self.features,)
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class BNParams(nn.Module):
    """Parameter/stat container matching nn.BatchNorm's tree: params
    scale/bias, batch_stats mean/var. Returns the Variable refs so the
    caller can update running statistics exactly like flax BN does."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), (self.features,),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), (self.features,),
        )
        return scale, bias, ra_mean, ra_var


def _moment_dense_bn(
    x, kernel, bias, scale, bn_bias, ra_mean, ra_var,
    use_running: bool, momentum: float = 0.9, eps: float = 1e-5,
    dtype=jnp.float32,
):
    """BN(x @ kernel + bias) with the BatchNorm affine folded into the
    matmul — including in TRAIN mode.

    The TPU-native trick: for a 1x1 dense h = xW + b, the batch statistics
    BN needs are exact functions of the INPUT's first/second moments
    (mu = E[x], M = E[x x^T], a [C_in, C_in] matmul):
        mean_h = mu W + b
        E[h^2]_j = (W^T M W)_jj + 2 b_j (mu W)_j + b_j^2
        var_h = E[h^2] - mean_h^2   (biased, exactly flax's formula)
    so the giant pre-BN activation [B*T*V, C_out] is never materialized,
    re-read for statistics, or re-read again for normalization — the output
    comes straight from ONE folded matmul that XLA fuses with the residual
    add and PReLU, and the backward through the statistics is matmul-shaped
    (MXU) instead of bandwidth-bound elementwise reductions. Same math ->
    same gradients; parity asserted in tests/test_moment_bn.py.

    Returns (y, (new_ra_mean, new_ra_var) or None). Moments accumulate in
    float32 regardless of the compute dtype.
    """
    kf = kernel.astype(jnp.float32)
    bf = jnp.zeros((kernel.shape[1],), jnp.float32) if bias is None else (
        bias.astype(jnp.float32)
    )
    if use_running:
        mean, var = ra_mean.value, ra_var.value
        new_stats = None
    else:
        # Moments in float32 (stats precision + XLA-CPU lacks bf16 dots);
        # the [R, C] x [R, C] -> [C, C] moment dot is tiny on the MXU.
        xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        r = xf.shape[0]
        s = jnp.sum(xf, axis=0)
        m2 = jax.lax.dot_general(
            xf, xf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C_in, C_in] = sum_r x_r x_r^T
        mu = s / r
        muw = mu @ kf
        mean = muw + bf
        e2 = jnp.einsum("ak,ab,bk->k", kf, m2, kf) / r + 2.0 * bf * muw + bf**2
        var = jnp.maximum(e2 - mean**2, 0.0)
        new_stats = (
            momentum * ra_mean.value + (1.0 - momentum) * mean,
            momentum * ra_var.value + (1.0 - momentum) * var,
        )
    inv = scale.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    w_eff = (kf * inv[None, :]).astype(dtype)
    b_eff = ((bf - mean) * inv + bn_bias.astype(jnp.float32)).astype(dtype)
    y = x.astype(dtype) @ w_eff + b_eff
    return y, new_stats


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch default, init 0.25)."""

    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda *_: jnp.asarray(self.init_alpha, jnp.float32))
        return jnp.where(x >= 0, x, alpha * x)


class SpaceTimeGraphConv(nn.Module):
    """The separable graph contraction: X <- X @_t Tadj, then X @_v Aadj.

    Input/output [B, T, V, C]. Equivalent to the reference's
    einsum('nctv,vtq->ncqv') + einsum('nctv,tvw->nctw')
    (models/graph_layers/stsgcn.py:154-155) in channels-last layout.
    Params stay float32; with a reduced `dtype` the contraction inputs are
    cast down and accumulated in float32 (MXU-native mixed precision).
    """

    time_dim: int
    joints_dim: int
    dtype: Any = jnp.float32
    # 'combined' (default): fuse the two separable contractions into ONE
    # [T*V, T*V] matmul — M[(t,v),(q,w)] = T[v,t,q] * A[q,v,w]. The
    # separable einsums batch tiny K=T/K=V contractions per joint/frame
    # (MXU pads every one to a full 128 tile) and their backward dominated
    # the train step: measured fwd+bwd per layer 1.46 ms (separable) vs
    # 0.90 ms (combined) at B=2048 bf16 on v5e-1. Identical linear map,
    # identical parameters/gradients; M is built in fp32 each call (a
    # [T,V,T,V]-sized einsum, trivial).
    graph_mode: str = "combined"

    @nn.compact
    def __call__(self, x):
        t, v = self.time_dim, self.joints_dim
        t_adj = self.param("t_adj", _uniform_init(1.0 / t**0.5), (v, t, t))
        a_adj = self.param("a_adj", _uniform_init(1.0 / v**0.5), (t, v, v))
        x = x.astype(self.dtype)
        if self.graph_mode == "combined":
            b, _, _, c = x.shape
            n = t * v
            m = jnp.einsum("vtq,qvw->tvqw", t_adj, a_adj).reshape(n, n)
            h = jnp.einsum(
                "bnc,nm->bmc", x.reshape(b, n, c), m.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            return h.reshape(b, t, v, c)
        # temporal mixing per joint: out[b, q, v, c] = sum_t x[b, t, v, c] * T[v, t, q]
        x = jnp.einsum(
            "btvc,vtq->bqvc", x, t_adj.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        # spatial mixing per frame: out[b, t, w, c] = sum_v x[b, t, v, c] * A[t, v, w]
        x = jnp.einsum(
            "btvc,tvw->btwc", x, a_adj.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        return x


class STSGCNLayer(nn.Module):
    """Full ST-GCNN layer: graph conv -> 1x1 dense + BN + dropout, residual,
    PReLU. Channels-last [B, T, V, C_in] -> [B, T, V, C_out]."""

    out_channels: int
    time_dim: int
    joints_dim: int
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    # BatchNorm implementation — all modes share an identical variable tree
    # and identical math (parity: tests/test_moment_bn.py):
    #   'auto' (default): moment-fold (_moment_dense_bn) whenever running
    #     statistics are in use (eval / frozen_bn) — fewer kernels on the
    #     scanned eval path, +20% scoring throughput measured — and the
    #     plain flax pair for live-stats training, where XLA's BN backward
    #     beats autodiff-through-moments (19.4 vs 6.3 ms/step measured).
    #   'moment': moment-fold everywhere (the in-kernel math of the fused
    #     Pallas train path; kept independently testable).
    #   'flax': plain nn.Dense + nn.BatchNorm everywhere.
    bn_mode: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        # frozen_bn: use running statistics during training (lets XLA fold
        # the BN affine into the dense layers; +22% step throughput measured)
        use_running = (not train) or frozen_bn
        in_channels = x.shape[-1]
        x = x.astype(self.dtype)
        moment = self.bn_mode == "moment" or (
            self.bn_mode == "auto" and use_running
        )
        res = x
        if in_channels != self.out_channels:
            if moment:
                rk, rb = DenseParams(
                    self.out_channels, in_channels, self.use_bias,
                    name="residual_dense",
                )()
                rs, rbb, rm, rv = BNParams(self.out_channels, name="residual_bn")()
                res, rstats = _moment_dense_bn(
                    x, rk, rb, rs, rbb, rm, rv, use_running, dtype=self.dtype
                )
                if rstats is not None:
                    rm.value, rv.value = rstats
            else:
                res = nn.Dense(
                    self.out_channels,
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    kernel_init=torch_linear_kernel_init,
                    bias_init=torch_bias_init_from_fan(in_channels),
                    name="residual_dense",
                )(x)
                res = nn.BatchNorm(
                    use_running_average=use_running, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="residual_bn",
                )(res)

        x = SpaceTimeGraphConv(
            self.time_dim, self.joints_dim, dtype=self.dtype, name="gcn"
        )(x)
        if moment:
            tk, tb = DenseParams(
                self.out_channels, in_channels, self.use_bias, name="tcn_dense"
            )()
            ts, tbb, tm, tv = BNParams(self.out_channels, name="tcn_bn")()
            x, tstats = _moment_dense_bn(
                x, tk, tb, ts, tbb, tm, tv, use_running, dtype=self.dtype
            )
            if tstats is not None:
                tm.value, tv.value = tstats
        else:
            x = nn.Dense(
                self.out_channels,
                use_bias=self.use_bias,
                dtype=self.dtype,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_bias_init_from_fan(in_channels),
                name="tcn_dense",
            )(x)
            x = nn.BatchNorm(
                use_running_average=use_running, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="tcn_bn"
            )(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x + res
        return PReLU(name="prelu")(x)


class STSGCNStack(nn.Module):
    """Sequential ST-GCNN layers over a channel schedule.

    Encoder: schedule = layer_channels + [hidden_dim]
    Decoder: schedule = reversed(layer_channels) + [output_dim]
    (reference models/common/components.py:70-105, 143-165).
    """

    channel_schedule: Sequence[int]
    time_dim: int
    joints_dim: int
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    bn_mode: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        for i, ch in enumerate(self.channel_schedule):
            x = STSGCNLayer(
                out_channels=ch,
                time_dim=self.time_dim,
                joints_dim=self.joints_dim,
                dropout=self.dropout,
                use_bias=self.use_bias,
                dtype=self.dtype,
                bn_mode=self.bn_mode,
                name=f"layer_{i}",
            )(x, train=train, frozen_bn=frozen_bn)
        return x


class MLPHead(nn.Module):
    """Linear -> BatchNorm -> ReLU per hidden layer, then a final Linear
    (reference models/common/components.py:209-226 intent)."""

    hidden_layers: Sequence[int]
    output_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden_layers):
            fan_in = x.shape[-1]
            x = nn.Dense(
                h,
                use_bias=self.use_bias,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_bias_init_from_fan(fan_in),
                name=f"hidden_{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        fan_in = x.shape[-1]
        return nn.Dense(
            self.output_size,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_bias_init_from_fan(fan_in),
            name="out",
        )(x)
