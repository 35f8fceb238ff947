"""STSE / STSAE / STSVAE: the COSKAD model family (flax.linen).

One canonical API serving all call sites (resolving the reference's
missing-module split, SURVEY.md section 0.1): an STS-GCN encoder stack, a
projector ("btlnk") to the latent space, optionally a mirrored decoder
(STSAE), optionally variational heads with PowerSpherical or Normal latents
(STSVAE). Reference: models/sts/ae.py (STSE/STSAE), models/sts/vae.py
(STSVAE), models/common/components.py (Encoder/Decoder/MLP).

The center `c`, inverse covariance and mean_vector are NOT hidden buffers
here — they are explicit training-state arrays (see train/state.py), the
functional-JAX equivalent of the reference's registered buffers
(models/sts/ae.py:69-73, models/sts/vae.py:57-60).

I/O is the reference's NCTV layout [B, C, T, V]; internally everything is
channels-last. Flatten order for the projector is (T, V, C); a
weight-transplant from the reference's (C, T, V) flatten must permute the
projector kernel accordingly (see tests/test_model_parity.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .stsgcn import (
    MLPHead,
    STSGCNStack,
    torch_bias_init_from_fan,
    torch_linear_kernel_init,
)


def _dense(features: int, fan_in: int, use_bias: bool, name: str,
           dtype=jnp.float32) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_bias_init_from_fan(fan_in),
        name=name,
    )


class LinearProjector(nn.Module):
    """nn.Dense over the flattened hidden, expressed as ONE dot_general that
    contracts the (T, V, C) axes of the 4-D hidden directly.

    Identical variable tree (`kernel` [T*V*C, latent], `bias` [latent]),
    init and math to `_dense(latent, flat)(h.reshape(B, -1))` — but the
    flatten moves to the (tiny) weight instead of the (huge) activation, so
    autodiff emits the hidden cotangent as [B, T, V, C] at the compute dtype
    in the layout its consumer (the top BN backward) wants. The reshape+Dense
    formulation materialized an f32 [B, T*V*C] cotangent plus a full layout-
    transpose copy of it (~0.5 ms/step at B=2048, profiled on v5e —
    RESULTS.md round 3)."""

    latent_dim: int
    fan_in: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        b, t, v, c = h.shape
        assert t * v * c == self.fan_in, (h.shape, self.fan_in)
        kernel = self.param(
            "kernel", torch_linear_kernel_init,
            (self.fan_in, self.latent_dim), jnp.float32,
        )
        w4 = kernel.reshape(t, v, c, self.latent_dim).astype(self.dtype)
        z = jax.lax.dot_general(
            h.astype(self.dtype), w4, (((1, 2, 3), (0, 1, 2)), ((), ()))
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init_from_fan(self.fan_in),
                (self.latent_dim,), jnp.float32,
            )
            z = z + bias.astype(self.dtype)
        return z


class ReverseProjector(nn.Module):
    """The decoder-side mirror of LinearProjector: latent [B, L] -> hidden
    [B, T, V, H] — the reference's channel-major de-flatten
    (models/sts/ae.py:222-226) composed with the channels-last transpose the
    decoder stack consumes — as one dot_general whose output IS the 4-D
    hidden in its consumer's layout. The [B, L]->[B, H*T*V] Dense + reshape
    + transpose formulation materialized the flat activation twice (forward
    value + backward cotangent, ~107 MB each at B=2048 fp32) plus a full
    [B, H, T, V]->[B, T, V, H] copy each direction; here both the de-flatten
    and the transpose move to the (tiny, ~1.7 MB) weight. Variable
    tree/init/math match `_dense(flat, latent)` exactly (`kernel`
    [latent, H*T*V] in channel-major flat order, `bias` [H*T*V])."""

    hidden_dimension: int
    n_frames: int
    n_joints: int
    latent_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        flat = self.hidden_dimension * self.n_frames * self.n_joints
        kernel = self.param(
            "kernel", torch_linear_kernel_init,
            (self.latent_dim, flat), jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init_from_fan(self.latent_dim),
            (flat,), jnp.float32,
        )
        shape4 = (self.hidden_dimension, self.n_frames, self.n_joints)
        w4 = kernel.reshape((self.latent_dim,) + shape4).astype(self.dtype)
        w4 = jnp.transpose(w4, (0, 2, 3, 1))  # [L, T, V, H]
        h = jax.lax.dot_general(
            z.astype(self.dtype), w4, (((1,), (0,)), ((), ()))
        )
        b4 = jnp.transpose(bias.reshape(shape4), (1, 2, 0))  # [T, V, H]
        return h + b4.astype(self.dtype)


class STSE(nn.Module):
    """Space-Time-Separable Graph Convolutional Encoder.

    forward: [B, C_in, T, V] -> latent [B, latent_dim].
    """

    input_dim: int = 2
    layer_channels: Sequence[int] = (32, 16, 32)
    hidden_dimension: int = 64
    latent_dim: int = 16
    n_frames: int = 12
    n_joints: int = 17
    encoder_type: str = "sts_gcn"  # see encoders.make_encoder registry
    projector: str = "linear"  # 'linear' | 'mlp'
    projector_hidden_layers: Optional[Sequence[int]] = None
    dropout: float = 0.0
    use_bias: bool = True
    # Compute dtype (params stay float32); bfloat16 halves the HBM traffic
    # that dominates the train step. Latents are always returned in float32.
    dtype: Any = jnp.float32
    # BatchNorm implementation for the STS-GCN stacks: 'auto' (default)
    # moment-folds dense+BN when running stats are in use and keeps flax BN
    # for live-stats training; 'moment'/'flax' force one implementation.
    # Identical math and variable tree (models/stsgcn.py:_moment_dense_bn).
    bn_mode: str = "auto"

    def setup(self):
        from .encoders import make_encoder

        self.encoder = make_encoder(
            self.encoder_type,
            layer_channels=self.layer_channels,
            hidden_dimension=self.hidden_dimension,
            n_frames=self.n_frames,
            n_joints=self.n_joints,
            dropout=self.dropout,
            use_bias=self.use_bias,
            dtype=self.dtype,
            bn_mode=self.bn_mode,
            name="encoder",
        )
        flat = self.hidden_dimension * self.n_frames * self.n_joints
        proj = self.projector.lower()
        if proj == "linear":
            self.btlnk = LinearProjector(
                latent_dim=self.latent_dim, fan_in=flat,
                use_bias=self.use_bias, dtype=self.dtype, name="btlnk",
            )
        elif proj == "mlp":
            hidden = list(self.projector_hidden_layers or [self.latent_dim])
            self.btlnk = MLPHead(
                hidden_layers=hidden,
                output_size=self.latent_dim,
                use_bias=self.use_bias,
                name="btlnk",
            )
        else:
            raise ValueError(f"Unsupported projector {self.projector!r}")

    def _apply_btlnk(self, x, train: bool, hidden4=None):
        if isinstance(self.btlnk, MLPHead):
            return self.btlnk(x, train=train)
        if isinstance(self.btlnk, LinearProjector):
            return self.btlnk(hidden4)  # contracts (T, V, C) directly
        return self.btlnk(x)

    def _hidden_flat(self, x, train: bool, frozen_bn: bool):
        """[B, C, T, V] -> flat hidden [B, T*V*hidden] at the COMPUTE dtype
        ((T, V, C) flatten order). Kept un-upcast so consumers that compute
        in bf16 (the VAE heads) read it without a 100+ MB fp32 round-trip."""
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCTV -> NTVC
        h = self.encoder(x, train=train, frozen_bn=frozen_bn)
        return h.reshape(h.shape[0], -1), h

    def encode(self, x, train: bool = False, frozen_bn: bool = False):
        """[B, C, T, V] -> (latent [B, D], hidden [B, T, V, hidden]).

        frozen_bn trains with running BN statistics (XLA folds the BN into
        the dense layers; see RunConfig.freeze_bn_after)."""
        flat, h = self._hidden_flat(x, train, frozen_bn)
        z = self._apply_btlnk(flat, train, hidden4=h).astype(jnp.float32)
        return z, h

    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        z, _ = self.encode(x, train=train, frozen_bn=frozen_bn)
        return z


class STSAE(STSE):
    """STSE + mirrored STS-GCN decoder; forward -> (latent, reconstruction).

    decoder_channels lets the auxiliary decoder be narrower than the encoder
    (the spherical VAE config uses [8, 8]); default mirrors the encoder.
    """

    decoder_channels: Optional[Sequence[int]] = None

    def setup(self):
        super().setup()
        if self.encoder_type.lower() != "sts_gcn":
            # Reference: decoder only defined for sts_gcn (models/sts/ae.py:261-265)
            raise ValueError(
                f"No decoder available for encoder type {self.encoder_type!r}"
            )
        # rev_btlnk runs at the model compute dtype: its output is the
        # largest decoder-path activation (~107 MB at B=2048 in fp32) and
        # feeds straight into the bf16 decoder stack — storing it in fp32
        # would double the dominant HBM traffic of the AE/VAE step.
        self.rev_btlnk = ReverseProjector(
            hidden_dimension=self.hidden_dimension, n_frames=self.n_frames,
            n_joints=self.n_joints, latent_dim=self.latent_dim,
            dtype=self.dtype, name="rev_btlnk",
        )
        dec_channels = list(self.decoder_channels or self.layer_channels[::-1])
        self.decoder = STSGCNStack(
            channel_schedule=dec_channels + [self.input_dim],
            time_dim=self.n_frames,
            joints_dim=self.n_joints,
            dropout=self.dropout,
            use_bias=self.use_bias,
            dtype=self.dtype,
            bn_mode=self.bn_mode,
            name="decoder",
        )

    def decode(self, z, train: bool = False, frozen_bn: bool = False):
        """latent [B, D] -> reconstruction [B, C_in, T, V]."""
        # rev_btlnk de-flattens channel-major like the reference
        # (models/sts/ae.py:222-226) and emits channels-last [B, T, V, H]
        # directly (the transpose lives on the weight).
        h = self.rev_btlnk(z)
        x = self.decoder(h, train=train, frozen_bn=frozen_bn)
        return jnp.transpose(x, (0, 3, 1, 2))  # NTVC -> NCTV

    def __call__(self, x, train: bool = False, frozen_bn: bool = False):
        z, _ = self.encode(x, train=train, frozen_bn=frozen_bn)
        recon = self.decode(z, train=train, frozen_bn=frozen_bn)
        return z, recon


class STSVAE(STSAE):
    """Variational STSAE with PowerSpherical ('ps') or diagonal-Normal
    latents (reference models/sts/vae.py).

    forward -> (z_sample, reconstruction, (z_mean, z_var)). Sampling uses the
    'sample' RNG collection; pass `sample=False` for the deterministic mean
    path (used at eval, matching the reference's predict-time behaviour of
    scoring the sampled latent — eval uses sample=True there; both exposed).
    """

    distribution: str = "ps"  # 'ps' | 'normal'
    # Concentration floor for 'ps': 1.0 = the reference's "+1 prevents
    # collapse" (models/sts/vae.py:141). Opt-in stabilizer raises it
    # (config.ModelConfig.kappa_floor; RESULTS.md round-5 diagnosis).
    kappa_floor: float = 1.0

    def setup(self):
        # STSAE.setup builds encoder/decoder/rev_btlnk; the VAE projector is
        # Identity for 'linear' and an MLP for 'mlp'
        # (models/sts/vae.py:135-169).
        STSE.setup(self)  # builds encoder + btlnk (overridden below)
        if self.encoder_type.lower() != "sts_gcn":
            raise ValueError(
                f"No decoder available for encoder type {self.encoder_type!r}"
            )
        flat = self.hidden_dimension * self.n_frames * self.n_joints
        proj = self.projector.lower()
        if proj == "mlp":
            head_in = self.latent_dim
        else:
            head_in = flat
        # Measured (RESULTS.md round 3): bf16 heads/native-dtype features
        # LOSE ~25% VAE train throughput vs this fp32 layout — XLA already
        # keeps the flat hidden fused, and bf16 here only breaks that
        # fusion. Heads stay fp32; rev_btlnk follows STSAE (compute dtype).
        var_out = 1 if self.distribution == "ps" else self.latent_dim
        if proj == "mlp":
            self.fc_mean = _dense(self.latent_dim, head_in, True, "fc_mean")
            self.fc_var = _dense(var_out, head_in, True, "fc_var")
        else:
            # Identity projector: the heads read the FLAT hidden
            # (models/sts/vae.py:151-156). Same dot_general formulation as
            # LinearProjector — contract (T, V, C) of the 4-D hidden in fp32
            # — so neither the fp32 [B, T*V*C] flat value nor its cotangent
            # (226 MB each at B=2048) ever materializes. Identical variable
            # tree/init/math to Dense over the flat hidden.
            self.fc_mean = LinearProjector(
                latent_dim=self.latent_dim, fan_in=head_in, use_bias=True,
                name="fc_mean")
            self.fc_var = LinearProjector(
                latent_dim=var_out, fan_in=head_in, use_bias=True,
                name="fc_var")
        self.rev_btlnk = ReverseProjector(
            hidden_dimension=self.hidden_dimension, n_frames=self.n_frames,
            n_joints=self.n_joints, latent_dim=self.latent_dim,
            dtype=self.dtype, name="rev_btlnk",
        )
        dec_channels = list(self.decoder_channels or self.layer_channels[::-1])
        self.decoder = STSGCNStack(
            channel_schedule=dec_channels + [self.input_dim],
            time_dim=self.n_frames,
            joints_dim=self.n_joints,
            dropout=self.dropout,
            use_bias=self.use_bias,
            dtype=self.dtype,
            bn_mode=self.bn_mode,
            name="decoder",
        )

    def _apply_btlnk(self, x, train: bool, hidden4=None):
        if self.projector.lower() == "mlp":
            return self.btlnk(x, train=train)
        return x  # identity projector for 'linear' (models/sts/vae.py:151)

    def encode_distribution(self, x, train: bool = False, frozen_bn: bool = False):
        """-> (z_mean [B, D], z_var [B, D or 1])."""
        z, h = self.encode(x, train=train, frozen_bn=frozen_bn)
        if isinstance(self.fc_mean, LinearProjector):
            # linear (identity) projector: heads contract the 4-D hidden
            # directly; the flat fp32 z is dead code XLA eliminates.
            z = h
        z_mean = self.fc_mean(z)
        if self.distribution == "ps":
            z_mean = z_mean / jnp.linalg.norm(z_mean, axis=-1, keepdims=True)
        z_var = nn.softplus(self.fc_var(z)) + self.kappa_floor
        return z_mean, z_var

    def __call__(self, x, train: bool = False, sample: bool = True,
                 frozen_bn: bool = False, sample_draws=None):
        from ..geometry.sphere import PowerSpherical

        z_mean, z_var = self.encode_distribution(x, train=train,
                                                 frozen_bn=frozen_bn)
        if sample_draws is not None:
            # Test-only lockstep hook: pre-drawn noise instead of make_rng
            # ('ps': (z01, v_raw) -> sample_from_draws; 'normal': (eps,)).
            if self.distribution == "ps":
                z = PowerSpherical(
                    z_mean, jnp.squeeze(z_var, -1)
                ).sample_from_draws(*sample_draws)
            else:
                z = z_mean + z_var * sample_draws[0]
        elif sample:
            key = self.make_rng("sample")
            if self.distribution == "ps":
                z = PowerSpherical(z_mean, jnp.squeeze(z_var, -1)).rsample(key)
            else:
                z = z_mean + z_var * jax.random.normal(key, z_mean.shape)
        else:
            z = z_mean
        recon = self.decode(z, train=train, frozen_bn=frozen_bn)
        return z, recon, (z_mean, z_var)


def build_model(
    use_decoder: bool = False,
    use_vae: bool = False,
    **kwargs,
):
    """Variant factory mirroring the reference's flag dispatch
    (train_COSKAD.py:36-55): use_vae -> STSVAE, use_decoder -> STSAE,
    else STSE. Hyperbolic/static-center variants share the STSE model and
    differ only in objective/center rule (train/objectives.py)."""
    if use_vae:
        return STSVAE(**kwargs)
    kwargs.pop("distribution", None)
    kwargs.pop("kappa_floor", None)
    if use_decoder:
        return STSAE(**kwargs)
    kwargs.pop("decoder_channels", None)
    return STSE(**kwargs)
