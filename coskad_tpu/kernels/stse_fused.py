"""Fused STSE forward (Pallas): pose windows -> latents in one kernel.

STATUS: experimental, off by default — measured SLOWER than XLA here.

The eval/scoring path runs the whole encoder — four ST-GCNN layers (combined
space-time graph contraction, 1x1 dense + folded BatchNorm, residual dense +
folded BatchNorm, PReLU) — as a single pallas_call with activations resident
in VMEM. Eval-mode BatchNorm is affine and folds into the preceding dense
(`fold_stse_params`), and the two separable graph einsums fuse into one
(T*V, T*V) matmul (`combined_graph_matrix`).

Measured on v5e-1 (batch 2048, fp32): XLA's eval forward is ~0.05-0.13 ms —
XLA already folds eval BN and fuses the whole forward, and the workload is
dispatch/latency-bound at this size, so the kernel cannot win. Mosaic
constraints compound this: minor-axis-merging reshapes and multi-dim-
contraction dots are rejected (so the projector runs outside the kernel),
and VMEM limits force small batch blocks (<= 16 rows at C=64), which makes
the in-kernel relayouts dominate. Kept as a validated reference
implementation (interpret-mode parity tests pass, on-TPU max err ~1e-3 fp32
reorder) and as the staging point for a future train-path kernel with a
custom VJP, where BatchNorm's batch statistics prevent XLA from folding and
~7 ms/step of bandwidth-bound work exists to save.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FoldedLayer(NamedTuple):
    graph: jax.Array  # [T*V, T*V] combined space-time contraction matrix
    w: jax.Array  # [C_in, C_out] with BN folded
    b: jax.Array  # [C_out]
    w_res: jax.Array  # [C_in, C_out] residual (identity-extended if same ch)
    b_res: jax.Array  # [C_out]
    alpha: jax.Array  # [] PReLU slope


class FoldedSTSE(NamedTuple):
    layers: List[FoldedLayer]
    w_proj: jax.Array  # [T*V*C_hidden, latent]
    b_proj: jax.Array  # [latent]


def _fold_dense_bn(dense: Dict, bn: Dict, stats: Dict, eps: float = 1e-5):
    inv = 1.0 / jnp.sqrt(stats["var"] + eps)
    scale = bn["scale"] * inv
    w = dense["kernel"] * scale[None, :]
    b = (dense.get("bias", 0.0) - stats["mean"]) * scale + bn["bias"]
    return w, b


def combined_graph_matrix(t_adj: jax.Array, a_adj: jax.Array) -> jax.Array:
    """Fuse the two separable contractions into one (T*V, T*V) matrix.

    out[b,(q,w),c] = sum_{t,v} x[b,(t,v),c] * T[v,t,q] * A[q,v,w], so
    M[(t,v),(q,w)] = T[v,t,q] * A[q,v,w]. One K=T*V matmul replaces two
    K=12/K=18 contractions — far better MXU tiling (contractions below 128
    pad a full tile anyway), and it is the only formulation this Mosaic
    version compiles (multi-batch-dim einsums are rejected)."""
    v, t, _ = t_adj.shape
    m = jnp.einsum("vtq,qvw->tvqw", t_adj, a_adj)
    return m.reshape(t * v, t * v)


def fold_stse_params(params: Dict, batch_stats: Dict) -> FoldedSTSE:
    """Fold a trained STSE's {params, batch_stats} (flax trees from
    models/stse.py) into the kernel's weight set."""
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    layers = []
    i = 0
    while f"layer_{i}" in enc_p:
        lp, ls = enc_p[f"layer_{i}"], enc_s[f"layer_{i}"]
        w, b = _fold_dense_bn(lp["tcn_dense"], lp["tcn_bn"], ls["tcn_bn"])
        c_in = lp["tcn_dense"]["kernel"].shape[0]
        c_out = w.shape[1]
        if "residual_dense" in lp:
            w_res, b_res = _fold_dense_bn(
                lp["residual_dense"], lp["residual_bn"], ls["residual_bn"]
            )
        else:
            w_res = jnp.eye(c_in, c_out, dtype=w.dtype)
            b_res = jnp.zeros((c_out,), w.dtype)
        layers.append(
            FoldedLayer(
                graph=combined_graph_matrix(lp["gcn"]["t_adj"], lp["gcn"]["a_adj"]),
                w=w,
                b=b,
                w_res=w_res,
                b_res=b_res,
                alpha=jnp.asarray(lp["prelu"]["alpha"]),
            )
        )
        i += 1
    # The projector kernel is stored [flat=(T*V*C), latent] with (t, v, c)
    # flatten order (STSE.encode); rearrange to [(c, n), latent] to match the
    # kernel's transposed hidden output [Bb, C, N].
    w_proj = params["btlnk"]["kernel"]
    flat, latent = w_proj.shape
    c_hidden = layers[-1].w.shape[1]
    n_nodes = flat // c_hidden
    w_proj = w_proj.reshape(n_nodes, c_hidden, latent).transpose(1, 0, 2).reshape(
        n_nodes * c_hidden, latent
    )
    return FoldedSTSE(
        layers=layers,
        w_proj=w_proj,
        b_proj=params["btlnk"].get("bias", jnp.zeros(latent)),
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(n_layers: int, t: int, v: int, x_ref, *refs):
    """Kernel body: refs = per-layer (graph, w, b, w_res, b_res, alpha) *
    n_layers, then out_ref. Only 2D dot_generals and in-VMEM transposes —
    the forms this Mosaic version compiles."""
    out_ref = refs[-1]
    x = x_ref[:]  # [Bb, N=T*V, C_in]
    bb, n, _ = x.shape
    for layer in range(n_layers):
        graph, w, b, w_res, b_res, alpha = refs[6 * layer : 6 * layer + 6]
        c_in = x.shape[-1]
        res = _dot(x.reshape(bb * n, c_in), w_res[:]).reshape(bb, n, -1) + b_res[:]
        # combined space-time contraction over the node axis
        xt = jnp.transpose(x, (0, 2, 1)).reshape(bb * c_in, n)
        h = _dot(xt, graph[:])
        h = jnp.transpose(h.reshape(bb, c_in, n), (0, 2, 1))
        # folded 1x1 dense + BN over channels
        h = _dot(h.reshape(bb * n, c_in), w[:]).reshape(bb, n, -1) + b[:]
        h = h + res
        x = jnp.where(h >= 0, h, alpha[0, 0] * h)
    # Projector partial sum: the flatten [Bb, N, C] -> [Bb, N*C] is a
    # minor-axis merge Mosaic rejects, and per-channel unrolling (64 dots)
    # blows up Mosaic compile time, so contract the NODE axis here —
    # u[b, c, q] = sum_n x[b, n, c] * Wp[n, (c q)] would cross channels;
    # instead emit the transposed hidden [Bb, C, N] (a supported relayout)
    # and let XLA finish z = sum_{c,n} hidden[b, c, n] * Wp_t[c, n, l],
    # which it fuses into a single MXU matmul.
    out_ref[:] = jnp.transpose(x, (0, 2, 1))


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_stse_forward(
    x: jax.Array, folded: FoldedSTSE, block_b: int = 128, interpret: bool = False
) -> jax.Array:
    """[B, C, T, V] windows -> [B, latent] latents via the fused kernel.

    B is padded to a multiple of block_b internally; weights are broadcast
    to every grid step (index_map -> block 0) and stay VMEM-resident.
    """
    b, c, t, v = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t * v, c)  # [B, N, C]
    pad = (-b) % block_b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, t * v, c), x.dtype)], axis=0)
    n_blocks = (b + pad) // block_b
    n_layers = len(folded.layers)
    c_hidden = folded.layers[-1].w.shape[1]

    weight_args = []
    weight_specs = []
    for lay in folded.layers:
        for arr in (lay.graph, lay.w, lay.b.reshape(1, -1),
                    lay.w_res, lay.b_res.reshape(1, -1),
                    lay.alpha.reshape(1, 1)):
            weight_args.append(arr)
            weight_specs.append(
                pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM)
            )

    hidden = pl.pallas_call(
        functools.partial(_kernel, n_layers, t, v),
        out_shape=jax.ShapeDtypeStruct(((b + pad), c_hidden, t * v), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_b, t * v, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((block_b, c_hidden, t * v), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *weight_args)
    # Final projector in XLA: one [B, C*N] x [C*N, latent] matmul.
    flat = hidden.reshape(b + pad, -1)
    return (flat @ folded.w_proj + folded.b_proj)[:b]
