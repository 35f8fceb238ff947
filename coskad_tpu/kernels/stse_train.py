"""Fused STSE *training* path (Pallas): forward + custom-VJP backward.

The round-1 measurement (DESIGN.md section 6): the train step is ~1.3 ms of
op-launch floor plus ~5 ms of bandwidth-bound work — BatchNorm batch
statistics and the backward pass re-reading [B, T, V, C] activations that
XLA materializes in HBM. The input windows are tiny ([B, 2, T, V]); every
large tensor in the step is an *intermediate*. This module therefore runs
the whole encoder — four ST-GCNN layers (combined space-time graph matmul,
1x1 dense + BatchNorm, residual dense + BatchNorm, PReLU) plus the linear
projector — as ONE Pallas kernel per direction, with all activations
VMEM-resident and the backward rematerializing the forward in-VMEM instead
of reading saved activations from HBM.

BatchNorm under fusion: exact full-batch statistics are sequentially
dependent across layers (layer i's stats need layer i-1's *normalized*
full-batch output), which forces either multi-pass HBM traffic (what XLA
does) or block-local statistics. We use **ghost BatchNorm**: statistics over
`ghost_size` consecutive samples x all valid graph nodes (a "ghost batch" of
ghost_size*T*V rows per channel). This is the TPU-native analogue of the
reference's own per-GPU BatchNorm — PyTorch-Lightning DDP computes BN stats
per rank (batch 512-2048 split over 2 GPUs; SURVEY.md section 7.3.7 pins
per-shard BN, not sync-BN, as the parity-faithful choice) — with the shard
size set by the VMEM block instead of the GPU count. Running statistics are
still aggregated exactly over the FULL batch (masked sum/sumsq accumulated
across blocks), so eval-mode behaviour matches stock BN closely. AUC parity
vs the live-BN XLA path is asserted in the head-to-head harness
(scripts/parity_vs_reference.py) before this path is used for benching.

Reference call-sites this replaces at train time: STSE.encode
(/root/reference/models/sts/ae.py:76-105) and the ST_GCNN_layer stack
(/root/reference/models/graph_layers/stsgcn.py:106-155).

Layout notes (Mosaic-probed on this toolchain):
  * Activations live as 3D [C, Bb, N] blocks — channels major, (sample,
    node) on the tiled sublane/lane dims — so the 1x1 dense is a 2Dx3D
    'jc,cbn->jbn' dot and BatchNorm stats are sequential single-axis
    reductions. N = T*V is zero-padded to 256 (a lane multiple), which
    makes the reshape [C, Bb, N] <-> [C*Bb, N] (graph-contraction form) a
    pure major-axis merge; [C, Bb*N] (minor merge) is NOT free and is
    avoided.
  * Supported & used: lhsT dots (contract dim 0 x dim 0) for dM/dWp and
    eye-matmul transposes, in-kernel `.T` on small 2D operands, (0,2,1)
    transposes, iota masks. NOT supported (avoided): rhsT dots (contract
    minor x minor), multi-axis jnp.sum, (C, 1) lane blocks / 1-sublane
    blocks in BlockSpecs, bf16-STORED intermediates (bf16 dot inputs are
    fine — see _parse_dtype).
  * Weight gradients accumulate across the sequential TPU grid into
    constant-index output blocks (init on block 0, += after).
  * Two backward modes (bwd_mode): 'split' (default) = one small kernel
    per layer reading forward-saved boundary activations; 'mono' = one
    kernel rematerializing the whole stack in VMEM. See DESIGN.md 6b and
    RESULTS.md 'Fused train kernel' for the measured trade-offs and the
    compile-infrastructure constraints that currently keep this path off
    by default.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD = 256
BN_EPS = 1e-5


# --------------------------------------------------------------------------
# Parameter plumbing: flax tree {params, batch_stats} -> flat kernel operands
# --------------------------------------------------------------------------


class LayerOps(NamedTuple):
    """Per-layer operands, all in kernel orientation (see module docstring).

    Everything here is produced by differentiable jnp ops from the flax
    tree, so grads w.r.t. these flow back to t_adj/a_adj/kernels/... for
    free once the custom-VJP returns cotangents for them."""

    m: jax.Array        # [N_PAD, N_PAD] combined graph matrix, zero-padded
    wt: jax.Array       # [C_out, C_in] tcn dense, transposed
    b: jax.Array        # [C_out, 1]
    gamma: jax.Array    # [C_out, 1] tcn BN scale
    beta: jax.Array     # [C_out, 1] tcn BN bias
    wt_res: jax.Array   # [C_out, C_in] residual dense, transposed
    b_res: jax.Array    # [C_out, 1]
    gamma_res: jax.Array
    beta_res: jax.Array
    alpha: jax.Array    # [1, 1] PReLU slope


class EncoderOps(NamedTuple):
    layers: Tuple[LayerOps, ...]
    wp: jax.Array       # [C_hidden * N_PAD, latent] projector, (c, n) row order
    bp: jax.Array       # [1, latent]


def combined_graph_matrix(t_adj: jax.Array, a_adj: jax.Array) -> jax.Array:
    """M[(t,v),(q,w)] = T[v,t,q] * A[q,v,w] — one [T*V, T*V] matmul is the
    same linear map as the two separable contractions
    (reference stsgcn.py:154-155); see models/stsgcn.py graph_mode."""
    v, t, _ = t_adj.shape
    m = jnp.einsum("vtq,qvw->tvqw", t_adj, a_adj)
    return m.reshape(t * v, t * v)


def _pad2(m: jax.Array, rows: int, cols: int) -> jax.Array:
    return jnp.pad(m, ((0, rows - m.shape[0]), (0, cols - m.shape[1])))


def encoder_ops_from_tree(params: Dict, n_nodes: int) -> EncoderOps:
    """Build kernel operands from an STSE flax param tree (differentiably)."""
    enc = params["encoder"]
    layers = []
    i = 0
    while f"layer_{i}" in enc:
        lp = enc[f"layer_{i}"]
        w = lp["tcn_dense"]["kernel"]  # [C_in, C_out]
        c_in, c_out = w.shape
        if "residual_dense" in lp:
            w_res = lp["residual_dense"]["kernel"]
            b_res = lp["residual_dense"].get("bias", jnp.zeros(c_out))
            gamma_res = lp["residual_bn"]["scale"]
            beta_res = lp["residual_bn"]["bias"]
        else:
            # identity residual (same channel count): fold as W=I, BN=noop
            w_res = jnp.eye(c_in, c_out, dtype=w.dtype)
            b_res = jnp.zeros(c_out)
            gamma_res = jnp.ones(c_out)
            beta_res = jnp.zeros(c_out)
        m = combined_graph_matrix(lp["gcn"]["t_adj"], lp["gcn"]["a_adj"])
        layers.append(
            LayerOps(
                m=_pad2(m, N_PAD, N_PAD),
                wt=w.T,
                b=lp["tcn_dense"].get("bias", jnp.zeros(c_out)).reshape(-1, 1),
                gamma=lp["tcn_bn"]["scale"].reshape(-1, 1),
                beta=lp["tcn_bn"]["bias"].reshape(-1, 1),
                wt_res=w_res.T,
                b_res=b_res.reshape(-1, 1),
                gamma_res=gamma_res.reshape(-1, 1),
                beta_res=beta_res.reshape(-1, 1),
                alpha=lp["prelu"]["alpha"].reshape(1, 1),
            )
        )
        i += 1
    # Projector: flax kernel rows are flat (n, c) order (STSE.encode flattens
    # (T, V, C)); the kernel emits hidden as [(c, n), Bb], so reorder rows to
    # (c, n) and zero-pad the node axis to N_PAD.
    wp = params["btlnk"]["kernel"]  # [n_nodes * C_h, latent]
    latent = wp.shape[1]
    c_h = layers[-1].wt.shape[0]
    wp = wp.reshape(n_nodes, c_h, latent).transpose(1, 0, 2)  # [C_h, n, L]
    wp = jnp.pad(wp, ((0, 0), (0, N_PAD - n_nodes), (0, 0)))
    wp = wp.reshape(c_h * N_PAD, latent)
    bp = params["btlnk"].get("bias", jnp.zeros(latent)).reshape(1, latent)
    return EncoderOps(layers=tuple(layers), wp=wp, bp=bp)


def has_identity_residual(params: Dict) -> Tuple[bool, ...]:
    enc = params["encoder"]
    out = []
    i = 0
    while f"layer_{i}" in enc:
        out.append("residual_dense" not in enc[f"layer_{i}"])
        i += 1
    return tuple(out)


# --------------------------------------------------------------------------
# Pure-jnp ghost-BN reference (the semantics the kernels must match; also
# the CPU fallback and the gradient oracle for the kernel parity tests)
# --------------------------------------------------------------------------


def _ghost_bn(h, gamma, beta):
    """BN over all (sample-in-block, node) rows per channel; biased var
    (flax's formula). h: [rows, C]. Returns (y, mean, var)."""
    mean = h.mean(axis=0)
    var = jnp.maximum((h * h).mean(axis=0) - mean * mean, 0.0)
    y = (h - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    return y, mean, var


def ghost_encode_reference(
    params: Dict, x: jax.Array, ghost_size: int
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """Differentiable jnp spec of the fused kernel.

    x: [B, C_in, T, V] (the reference's NCTV batch layout). Returns
    (z [B, latent] fp32, per-layer dicts of full-batch pre-BN sums:
    {'tcn_sum','tcn_sumsq','res_sum','res_sumsq'} each [C_out]) — the sums
    feed the exact full-batch running-statistics update.
    """
    b, c_in, t, v = x.shape
    assert b % ghost_size == 0, (b, ghost_size)
    n = t * v
    enc = params["encoder"]
    n_layers = len([k for k in enc if k.startswith("layer_")])

    # [B, C, T, V] -> [G, gb*n, C] blocks of channels-last rows
    xb = jnp.transpose(x, (0, 2, 3, 1)).reshape(
        b // ghost_size, ghost_size * n, c_in
    ).astype(jnp.float32)

    stats: List[Dict[str, jax.Array]] = []
    h = xb
    for i in range(n_layers):
        lp = enc[f"layer_{i}"]
        g, gb_n, ci = h.shape
        m = combined_graph_matrix(lp["gcn"]["t_adj"], lp["gcn"]["a_adj"])

        def layer(hb):  # [gb*n, C_in] one ghost block
            rows = hb.reshape(ghost_size, n, ci)
            gr = jnp.einsum("bnc,nm->bmc", rows, m).reshape(gb_n, ci)
            tpre = gr @ lp["tcn_dense"]["kernel"] + lp["tcn_dense"].get(
                "bias", 0.0
            )
            tn, t_mean, t_var = _ghost_bn(
                tpre, lp["tcn_bn"]["scale"], lp["tcn_bn"]["bias"]
            )
            if "residual_dense" in lp:
                rpre = hb @ lp["residual_dense"]["kernel"] + lp[
                    "residual_dense"
                ].get("bias", 0.0)
                rn, r_mean, r_var = _ghost_bn(
                    rpre, lp["residual_bn"]["scale"], lp["residual_bn"]["bias"]
                )
            else:
                rpre = hb
                rn, r_mean, r_var = hb, jnp.zeros(ci), jnp.ones(ci)
            pre = tn + rn
            alpha = lp["prelu"]["alpha"]
            y = jnp.where(pre >= 0, pre, alpha * pre)
            return y, (tpre, rpre)

        y, (tpre, rpre) = jax.vmap(layer)(h)
        rows_total = b * n
        stats.append(
            {
                "tcn_sum": tpre.sum(axis=(0, 1)),
                "tcn_sumsq": (tpre * tpre).sum(axis=(0, 1)),
                "res_sum": rpre.sum(axis=(0, 1)),
                "res_sumsq": (rpre * rpre).sum(axis=(0, 1)),
                "count": jnp.asarray(rows_total, jnp.float32),
            }
        )
        h = y

    c_h = h.shape[-1]
    flat = h.reshape(b, n * c_h)  # (n, c) row-major == STSE (T, V, C) flatten
    z = flat @ params["btlnk"]["kernel"] + params["btlnk"].get("bias", 0.0)
    return z.astype(jnp.float32), stats


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------

N_LAYER_OPS = len(LayerOps._fields)

def _parse_dtype(dt):
    """dt may be 'float32', 'bfloat16', or 'bfloat16_f32store' (bf16 MXU
    inputs but fp32-stored big intermediates — the v2 storage policy that
    compiled under scan where bf16-stored intermediates do not). The dt
    string may carry a '+widen' suffix (interpret mode: the CPU backend
    cannot execute bf16 x bf16 -> f32 dots, so operands are rounded to bf16
    then widened back to f32, reproducing the MXU's semantics exactly)."""
    dt = dt.removesuffix("+widen")
    if dt == "bfloat16_f32store":
        return jnp.dtype("bfloat16"), jnp.dtype("float32")
    d = jnp.dtype(dt)
    return d, d


def _widen_dtype(dt: str, interpret: bool) -> str:
    """Tag the compute-dtype string for interpret mode (see _parse_dtype).
    Threaded through the kernels as part of the static dtype arg — an
    explicit parameter, not a mutable module global, so concurrent tracing
    of interpret and compiled variants cannot interleave."""
    return dt + "+widen" if interpret else dt


def _dop(a, dtype):
    """Prepare a dot operand: cast to compute dtype (bf16 halves the MXU
    input bandwidth), widening back to f32 only under interpret mode
    (dtype tagged '+widen' by the pallas_call wrappers)."""
    widen = False
    if isinstance(dtype, str):
        widen = dtype.endswith("+widen")
        dtype = _parse_dtype(dtype)[0]
    a = a.astype(dtype)
    if widen and a.dtype != jnp.float32:
        a = a.astype(jnp.float32)
    return a




def _colsum32(a3):
    """[C, bb, N] -> [C, 1] fp32, sequential single-axis reduces only (a
    multi-axis jnp.sum SIGABRTs this Mosaic version); inputs upcast
    in-flight so bf16 storage keeps fp32 accumulation."""
    return jnp.sum(jnp.sum(a3.astype(jnp.float32), axis=2), axis=1).reshape(
        -1, 1
    )


def _colsumsq32(a3):
    a32 = a3.astype(jnp.float32)
    return jnp.sum(jnp.sum(a32 * a32, axis=2), axis=1).reshape(-1, 1)


def _colprod32(a3, b3):
    return jnp.sum(
        jnp.sum(a3.astype(jnp.float32) * b3.astype(jnp.float32), axis=2),
        axis=1,
    ).reshape(-1, 1)


def _layer_fwd(x3, refs, bb, n_valid, res_identity,
               dtype=jnp.float32, need_y=True):
    """One ST-GCNN layer on a 3D [C_in, bb, N_PAD] activation.

    TPU layout strategy (measured, see module docstring): every reshape used
    here is a free major-axis merge/split (tiles never move); the dense is a
    2Dx3D dot ('jc,cbn->jbn', same cost as the 2D form).

    Pad handling (the v4 "lean" scheme): inputs carry the invariant that
    their pad columns are EXACTLY ZERO (the wrapper zero-pads x; each layer
    re-establishes it by masking the PReLU output — one iota-select fused
    into the activation write). Consequences used throughout: the graph
    matrix has zero pad rows/cols so g3's pads are exactly 0 and t3's pad
    value is exactly the tcn bias; the residual branch's pad value is b_res;
    and every backward reduction against dy/dpre (whose pads are zero) is
    valid-exact with no analytic corrections.

    Large intermediates (g3, t3, r3, pre3) are stored in `dtype` — at bf16
    this halves the VPU/VMEM bytes of every elementwise pass, the dominant
    cost of the fused step. Per-channel statistics are still accumulated in
    fp32 (reductions upcast in-flight, which costs compute, not bandwidth).

    Returns (y3, internals) with internals = (g3, t3, t_mean, t_inv_std,
    r3, r_mean, r_inv_std, scale_t, shift_t, scale_r, shift_r, pre3, sums4).
    """
    (m, wt, b, gamma, beta, wt_res, b_res, gamma_res, beta_res, alpha) = refs
    ddt, sdt = _parse_dtype(dtype)
    c_in = x3.shape[0]
    c_out = wt.shape[0]
    cnt = bb * n_valid
    npad_cnt = float(bb * (N_PAD - n_valid))

    def dot(a, bmat):
        return jax.lax.dot_general(
            _dop(a, dtype), _dop(bmat, dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dotg(w, a3):  # 'jc,cbn->jbn'
        return jax.lax.dot_general(
            _dop(w, dtype), _dop(a3, dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # combined space-time graph contraction (free reshapes around one dot)
    g3 = dot(x3.reshape(c_in * bb, N_PAD), m[:]).astype(sdt).reshape(
        c_in, bb, N_PAD
    )
    t3 = (dotg(wt[:], g3) + b[:][:, None, :]).astype(sdt)
    t_pad = b[:]
    t_sum = _colsum32(t3) - npad_cnt * t_pad
    t_sumsq = _colsumsq32(t3) - npad_cnt * t_pad * t_pad
    t_mean = t_sum / cnt
    t_var = jnp.maximum(t_sumsq / cnt - t_mean * t_mean, 0.0)
    t_inv_std = jax.lax.rsqrt(t_var + BN_EPS)
    scale_t = gamma[:] * t_inv_std
    shift_t = beta[:] - t_mean * scale_t

    if res_identity:
        r3 = x3
        r_mean = jnp.zeros((c_out, 1), jnp.float32)
        r_inv_std = jnp.ones((c_out, 1), jnp.float32)
        scale_r = jnp.ones((c_out, 1), jnp.float32)
        shift_r = jnp.zeros((c_out, 1), jnp.float32)
        r_sum = jnp.zeros((c_out, 1), jnp.float32)
        r_sumsq = jnp.zeros((c_out, 1), jnp.float32)
    else:
        r3 = (dotg(wt_res[:], x3) + b_res[:][:, None, :]).astype(sdt)
        r_pad = b_res[:]  # x3 pads are zero
        r_sum = _colsum32(r3) - npad_cnt * r_pad
        r_sumsq = _colsumsq32(r3) - npad_cnt * r_pad * r_pad
        r_mean = r_sum / cnt
        r_var = jnp.maximum(r_sumsq / cnt - r_mean * r_mean, 0.0)
        r_inv_std = jax.lax.rsqrt(r_var + BN_EPS)
        scale_r = gamma_res[:] * r_inv_std
        shift_r = beta_res[:] - r_mean * scale_r

    # pre-activation kept in f32: bf16 COMPARES are rejected by this
    # Mosaic toolchain (probed 2026-08-17, scripts/probe_mosaic.py) while
    # f32-predicate selects over bf16 branches compile — and the f32
    # accumulate is numerically better for the PReLU boundary anyway.
    pre3 = (
        t3.astype(jnp.float32) * scale_t[:, None, :] + shift_t[:, None, :]
        + r3.astype(jnp.float32) * scale_r[:, None, :]
        + shift_r[:, None, :]
    )
    alpha_d = alpha[0, 0]
    # need_y=False: the PReLU output pass is skipped (callers that only
    # need the internals). The pad-column mask re-establishes the zero-pad
    # invariant for the next layer / the stored activation (pre3's pads are
    # per-channel constants from the BN shifts).
    if need_y:
        nmask = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, N_PAD), 2
        ) < n_valid
        y3 = jnp.where(
            nmask, jnp.where(pre3 >= 0, pre3, alpha_d * pre3), 0
        ).astype(sdt)
    else:
        y3 = None
    return y3, (
        g3, t3, t_mean, t_inv_std, r3, r_mean, r_inv_std,
        scale_t, shift_t, scale_r, shift_r, pre3,
        (t_sum, t_sumsq, r_sum, r_sumsq),
    )


def _fwd_kernel(n_layers, bb, n_valid, res_identity, dtype, save_acts,
                *refs):
    """refs = x_ref, (10 per layer), wp, bp, then outputs:
    z_ref, (t_sum, t_sumsq, r_sum, r_sumsq) per layer; with save_acts also
    each layer's output activation block [C_out, bb, N] (pad columns zero)
    and the layer's per-ghost-block BN statistics (t_mean, t_inv_std,
    r_mean, r_inv_std) as (8, C_out) rows — the residuals the split
    backward reads so it never recomputes statistics."""
    x_ref = refs[0]
    w_refs = refs[1 : 1 + N_LAYER_OPS * n_layers]
    wp_ref, bp_ref = refs[1 + N_LAYER_OPS * n_layers : 3 + N_LAYER_OPS * n_layers]
    out_refs = refs[3 + N_LAYER_OPS * n_layers :]
    z_ref = out_refs[0]
    stat_refs = out_refs[1 : 1 + 4 * n_layers]
    act_refs = out_refs[1 + 4 * n_layers :] if save_acts else ()

    i = pl.program_id(0)
    ddt, sdt = _parse_dtype(dtype)
    x3 = x_ref[:].astype(sdt)
    for l in range(n_layers):
        lrefs = w_refs[N_LAYER_OPS * l : N_LAYER_OPS * (l + 1)]
        x3, internals = _layer_fwd(
            x3, lrefs, bb, n_valid, res_identity[l], dtype
        )
        if save_acts:
            # boundary activations stored f32 regardless of compute dtype:
            # bf16-typed pallas OUTPUT blocks fail this toolchain's remote
            # Mosaic compile (probed 2026-08-17; plain bf16 compute with
            # f32 outputs compiles fine)
            act_refs[l][:] = x3.astype(jnp.float32)
            # per-block BN stats, one (8, C) block per grid step (the value
            # replicated over the 8 sublanes): the smallest block Mosaic's
            # (8, 128)-divisibility rule allows without dynamic stores
            t_mean, t_inv, r_mean, r_inv = (
                internals[2], internals[3], internals[5], internals[6]
            )
            for k, v in enumerate((t_mean, t_inv, r_mean, r_inv)):
                bref = act_refs[n_layers + 4 * l + k]
                bref[:] = jnp.broadcast_to(
                    jnp.transpose(v, (1, 0)), bref.shape
                )
        sums = internals[-1]
        for k in range(4):
            ref = stat_refs[4 * l + k]

            @pl.when(i == 0)
            def _(ref=ref, val=sums[k]):
                ref[:] = val

            @pl.when(i > 0)
            def _(ref=ref, val=sums[k]):
                ref[:] = ref[:] + val

    c_h = x3.shape[0]
    # f32 before the transpose: bf16 transpose+merge-reshape is rejected
    # by this Mosaic (probe_mosaic.py transpose_merge)
    hcn = jnp.transpose(x3.astype(jnp.float32), (0, 2, 1)).reshape(
        c_h * N_PAD, bb
    )
    z = jax.lax.dot_general(
        _dop(hcn, dtype), _dop(wp_ref[:], dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z_ref[:] = z + bp_ref[:]


def _bwd_kernel(n_layers, bb, n_valid, res_identity, dtype, *refs):
    """Mono backward: refs = x_ref, dz_ref, (10 weights per layer), wp, then
    outputs: (dm, dwt, db, dgamma, dbeta, dwt_res, db_res, dgamma_res,
    dbeta_res, dalpha) per layer, dwp, dbp. Rematerializes the forward once
    in VMEM (keeping layer inputs + the tiny per-block BN stats), then runs
    the same lean per-layer backward the split kernels use — no statistic
    recomputation in the sweep."""
    x_ref, dz_ref = refs[0], refs[1]
    w_refs = refs[2 : 2 + N_LAYER_OPS * n_layers]
    wp_ref = refs[2 + N_LAYER_OPS * n_layers]
    out_refs = refs[3 + N_LAYER_OPS * n_layers :]

    i = pl.program_id(0)
    ddt, sdt = _parse_dtype(dtype)

    def dot(a, bmat):
        return jax.lax.dot_general(
            _dop(a, dtype), _dop(bmat, dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i > 0)
        def _():
            ref[:] = ref[:] + val

    # ---- forward remat, keeping layer inputs + per-block stats
    x_in = [x_ref[:].astype(sdt)]
    stats_l = []
    for l in range(n_layers):
        lrefs = w_refs[N_LAYER_OPS * l : N_LAYER_OPS * (l + 1)]
        y, internals = _layer_fwd(
            x_in[-1], lrefs, bb, n_valid, res_identity[l], dtype
        )
        x_in.append(y)
        stats_l.append((internals[2], internals[3],
                        internals[5], internals[6]))

    # ---- projector backward
    c_h = x_in[-1].shape[0]
    dz = dz_ref[:].astype(jnp.float32)  # [bb, L]
    hcn = jnp.transpose(x_in[-1].astype(jnp.float32), (0, 2, 1)).reshape(
        c_h * N_PAD, bb
    )
    accum(out_refs[N_LAYER_OPS * n_layers], dot(hcn, dz))  # dwp [C_h*N, L]
    accum(
        out_refs[N_LAYER_OPS * n_layers + 1],
        jnp.sum(dz, axis=0, keepdims=True),
    )  # dbp [1, L]
    dh_cn = dot(wp_ref[:], dz.T).astype(sdt)  # [C_h*N, bb]
    dy = jnp.transpose(dh_cn.reshape(c_h, N_PAD, bb), (0, 2, 1))  # [C_h,bb,N]
    # wp pad rows are zero -> dy pad columns are exactly zero (invariant the
    # lean body relies on)

    # ---- layer backward sweep
    for l in reversed(range(n_layers)):
        lrefs = w_refs[N_LAYER_OPS * l : N_LAYER_OPS * (l + 1)]
        out10 = out_refs[N_LAYER_OPS * l : N_LAYER_OPS * (l + 1)]
        dy = _layer_bwd_body(
            lrefs, x_in[l], dy, stats_l[l], out10, accum,
            bb, n_valid, res_identity[l], dtype,
        )


def _layer_bwd_body(lrefs, x3, dy, stats4, out10, accum,
                    bb, n_valid, res_id, dtype):
    """One ST-GCNN layer's lean backward (v5 "dot-folded").

    The key identity: the pre-BN activations t3 = Wt@g3 + b and
    r3 = Wr@x3 + b_res are linear images of arrays the backward already
    holds, so they are NEVER materialized here — every consumer folds:

      pre3      = (st*Wt)@g3 + (sr*Wr)@x3 + const      (two dots, direct)
      s2_t      = rowsum(Wt o P) + b*s1                 (P = dpre@g3T, the
                                                         same dot dWt needs)
      t3@g3T    = Wt@(g3@g3T) + b (x) g3sum^T           (Gram matrix G)
      (Wt*b)^T@t3 = M2@g3 + const                       (M2 = (Wt*b)^T Wt,
                                                         [C_in, C_in] tiny)

    and symmetrically for the residual branch with Q = dpre@x3T and
    X = x3@x3T. This removes the t3/r3 stores plus their four big reads —
    ~35% of the backward's VMEM traffic, the measured bound — at the cost
    of O(C^2)-to-O(C^3) scalar math on the otherwise idle MXU/VPU.

    Statistics come in saved from the forward (stats4); x3 and dy pad
    columns are exactly zero (see _layer_fwd), so every reduction is
    valid-exact and dWres needs no masking passes. Returns dx3 for the
    layer below (pad columns re-zeroed)."""
    (m, wt, b, gamma, beta, wt_res, b_res, gamma_res, beta_res, alpha) = lrefs
    ddt, sdt = _parse_dtype(dtype)
    cnt = bb * n_valid
    cols = bb * N_PAD
    c_in = x3.shape[0]
    t_mean, t_inv_std, r_mean, r_inv_std = stats4  # [C_out, 1] f32 each

    def dot(a, bmat):
        return jax.lax.dot_general(
            _dop(a, dtype), _dop(bmat, dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot0(a, bmat):  # contract dim 0 x dim 0 (lhsT form)
        return jax.lax.dot_general(
            _dop(a, dtype), _dop(bmat, dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dotg(w, a3):  # 'jc,cbn->jbn'
        return jax.lax.dot_general(
            _dop(w, dtype), _dop(a3, dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    wt32 = wt[:].astype(jnp.float32)
    b32 = b[:]
    scale_t = gamma[:] * t_inv_std
    shift_t = beta[:] - t_mean * scale_t
    if res_id:
        wr32 = None
        scale_r = jnp.ones_like(scale_t)
        shift_r = jnp.zeros_like(shift_t)
        br32 = jnp.zeros_like(b32)
    else:
        wr32 = wt_res[:].astype(jnp.float32)
        scale_r = gamma_res[:] * r_inv_std
        shift_r = beta_res[:] - r_mean * scale_r
        br32 = b_res[:]

    # ---- recompute g3 + pre3 directly (t3/r3 never materialize)
    g3 = dot(x3.reshape(c_in * bb, N_PAD), m[:]).astype(sdt).reshape(
        c_in, bb, N_PAD
    )
    pre_const = scale_t * b32 + shift_t + scale_r * br32 + shift_r
    # pre3 stays f32: its only consumers are the PReLU predicate and the
    # dalpha minimum, and bf16 compares are Mosaic-rejected (probe_mosaic)
    pre3 = dotg((scale_t * wt32).astype(sdt), g3)
    if res_id:
        pre3 = pre3 + x3.astype(jnp.float32)
    else:
        pre3 = pre3 + dotg((scale_r * wr32).astype(sdt), x3)
    pre3 = pre3 + pre_const[:, None, :]

    # PReLU backward; dy pads are zero so dpre pads are zero
    alpha_d = alpha[0, 0].astype(sdt)
    dpre = jnp.where(pre3 < 0, alpha_d * dy, dy).astype(sdt)
    # dalpha = sum_neg dy*pre3 == sum dy*min(pre3, 0)
    dalpha = jnp.sum(_colprod32(dy, jnp.minimum(pre3, 0))).reshape(1, 1)
    accum(out10[9], dalpha)

    s1 = _colsum32(dpre)

    # ---- transposes + products shared by the weight grads
    g3t = dot0(g3.reshape(c_in, cols), jnp.eye(c_in, dtype=jnp.float32))
    g3sum = _colsum32(g3)  # [c_in, 1]
    p_t = dot(dpre.reshape(-1, cols), g3t)  # [C_out, C_in] = dpre (.) g3
    gram_g = dot(g3.reshape(c_in, cols), g3t)  # [C_in, C_in]

    def bn_consts(s2, mean, inv_std, gam):
        """Per-channel affine constants of the ghost-BN backward:
        d_raw = a*dpre + b*raw + c. Also returns (dgamma, dbeta)."""
        dbeta_ = s1
        dgamma_ = inv_std * (s2 - mean * s1)
        a_c = gam * inv_std
        b_c = -a_c * inv_std * (dgamma_ / cnt)
        c_c = -a_c * (s1 / cnt) - b_c * mean
        return a_c, b_c, c_c, dgamma_, dbeta_

    # ---- tcn branch (all consumers folded through P / G / M2)
    s2_t = jnp.sum(wt32 * p_t, axis=1, keepdims=True) + b32 * s1
    a_t, b_t, c_t, dgamma, dbeta = bn_consts(s2_t, t_mean, t_inv_std,
                                             gamma[:])
    accum(out10[3], dgamma)
    accum(out10[4], dbeta)
    # db = sum_valid(d_t3) = a*s1 + b*t_sum + c*cnt, t_sum = cnt*t_mean
    accum(out10[2], a_t * s1 + b_t * (cnt * t_mean) + c_t * cnt)
    # dwt = a*P + b*(t3@g3T) + c (x) g3sum^T, with t3@g3T folded through G
    dwt = (
        a_t * p_t
        + b_t * (jnp.matmul(wt32, gram_g) + b32 * g3sum.reshape(1, -1))
        + c_t * g3sum.reshape(1, -1)
    )
    accum(out10[1], dwt)
    # dg3 = (wt*a)^T @ dpre + M2 @ g3 + const, M2 = (wt*b)^T wt
    m2_t = jnp.matmul((wt32 * b_t).T, wt32)  # [C_in, C_in]
    dg3 = (
        dotg((wt32 * a_t).T, dpre)
        + dotg(m2_t.astype(sdt), g3)
        + jnp.matmul(wt32.T, c_t + b_t * b32)[:, None, :]
    ).astype(sdt)
    dgr = dg3.reshape(c_in * bb, N_PAD)
    accum(out10[0], dot0(x3.reshape(c_in * bb, N_PAD), dgr))
    # ^ dm [N, N] (pad rows/cols sliced by the wrapper)
    dx3 = dot(dgr, m[:].T).astype(sdt).reshape(c_in, bb, N_PAD)
    # dx3 pads: m pad rows are zero -> graph part pads exactly zero

    # ---- residual branch
    if res_id:
        dx3 = dx3 + dpre  # dpre pads zero -> invariant holds, no mask
        c_out = wt.shape[0]
        for k, shape in ((5, (c_out, c_in)), (6, (c_out, 1)),
                         (7, (c_out, 1)), (8, (c_out, 1))):
            accum(out10[k], jnp.zeros(shape, jnp.float32))
    else:
        x3t = dot0(x3.reshape(c_in, cols), jnp.eye(c_in, dtype=jnp.float32))
        x3vsum = _colsum32(x3)  # valid-exact: pads zero
        q_r = dot(dpre.reshape(-1, cols), x3t)  # [C_out, C_in]
        gram_x = dot(x3.reshape(c_in, cols), x3t)  # [C_in, C_in]
        s2_r = jnp.sum(wr32 * q_r, axis=1, keepdims=True) + br32 * s1
        a_r, b_r, c_r, dgamma_r, dbeta_r = bn_consts(
            s2_r, r_mean, r_inv_std, gamma_res[:]
        )
        accum(out10[7], dgamma_r)
        accum(out10[8], dbeta_r)
        accum(out10[6], a_r * s1 + b_r * (cnt * r_mean) + c_r * cnt)
        dwres = (
            a_r * q_r
            + b_r * (jnp.matmul(wr32, gram_x)
                     + br32 * x3vsum.reshape(1, -1))
            + c_r * x3vsum.reshape(1, -1)
        )
        accum(out10[5], dwres)
        m2_r = jnp.matmul((wr32 * b_r).T, wr32)
        dx3 = dx3 + (
            dotg((wr32 * a_r).T, dpre)
            + dotg(m2_r.astype(sdt), x3)
            + jnp.matmul(wr32.T, c_r + b_r * br32)[:, None, :]
        ).astype(sdt)
        # the constant term puts values in the pad columns; re-establish
        # the zero-pad invariant for the layer below
        nmask = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, N_PAD), 2
        ) < n_valid
        dx3 = jnp.where(nmask, dx3, 0).astype(sdt)
    return dx3


def _top_layer_bwd_kernel(bb, n_valid, res_id, dtype, *refs):
    """Projector backward fused into the TOP ST-GCNN layer's backward
    (split mode): dy never round-trips HBM. refs = x_ref [C_in, bb, N],
    y4_ref [C_h, bb, N] (the saved final activation), dz_ref [bb, L],
    wp_ref, 4 per-block stat rows, 10 weights; outputs: 10 grads, dwp,
    dbp (grid-accumulated), dx_ref [C_in, bb, N]."""
    x_ref, y4_ref, dz_ref, wp_ref = refs[:4]
    stat_refs = refs[4:8]
    lrefs = refs[8 : 8 + N_LAYER_OPS]
    out_refs = refs[8 + N_LAYER_OPS :]
    out10 = out_refs[:N_LAYER_OPS]
    dwp_ref, dbp_ref, dx_ref = out_refs[N_LAYER_OPS:]

    i = pl.program_id(0)

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i > 0)
        def _():
            ref[:] = ref[:] + val

    _ddt, sdt = _parse_dtype(dtype)
    c_h = y4_ref.shape[0]
    dz = dz_ref[:].astype(jnp.float32)  # [bb, L]
    hcn = jnp.transpose(y4_ref[:].astype(jnp.float32), (0, 2, 1)).reshape(
        c_h * N_PAD, bb
    )
    accum(dwp_ref, jax.lax.dot_general(
        _dop(hcn, dtype), _dop(dz, dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ))
    accum(dbp_ref, jnp.sum(dz, axis=0, keepdims=True))
    dh_cn = jax.lax.dot_general(
        _dop(wp_ref[:], dtype), _dop(dz.T, dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # wp pad rows are zero -> dy pad columns are exactly zero
    dy = jnp.transpose(dh_cn.reshape(c_h, N_PAD, bb), (0, 2, 1)).astype(sdt)

    stats4 = tuple(
        jnp.transpose(r[0:1, :], (1, 0)) for r in stat_refs
    )
    dx3 = _layer_bwd_body(
        lrefs, x_ref[:].astype(sdt), dy, stats4,
        out10, accum, bb, n_valid, res_id, dtype,
    )
    dx_ref[:] = dx3.astype(jnp.float32)


def _layer_bwd_kernel(bb, n_valid, res_id, dtype, *refs):
    """One layer's backward as its own kernel (split mode). refs =
    x_ref [C_in, bb, N], dy_ref [C_out, bb, N], then the layer's four
    per-block BN stat rows (t_mean, t_inv_std, r_mean, r_inv_std, each an
    (8, C_out) block of an [8*n_blocks, C_out] array — see pad_spec_c),
    10 weights, then outputs: 10 grads (grid-accumulated) and
    dx_ref [C_in, bb, N]."""
    x_ref, dy_ref = refs[:2]
    stat_refs = refs[2:6]
    lrefs = refs[6 : 6 + N_LAYER_OPS]
    out10 = refs[6 + N_LAYER_OPS : 6 + 2 * N_LAYER_OPS]
    dx_ref = refs[6 + 2 * N_LAYER_OPS]

    i = pl.program_id(0)

    def accum(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:] = val

        @pl.when(i > 0)
        def _():
            ref[:] = ref[:] + val

    _ddt, sdt = _parse_dtype(dtype)
    stats4 = tuple(
        jnp.transpose(r[0:1, :], (1, 0)) for r in stat_refs
    )  # each [C_out, 1]
    dx3 = _layer_bwd_body(
        lrefs, x_ref[:].astype(sdt), dy_ref[:].astype(sdt), stats4,
        out10, accum, bb, n_valid, res_id, dtype,
    )
    dx_ref[:] = dx3.astype(jnp.float32)


# --------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# --------------------------------------------------------------------------


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _ops_arrays(ops: EncoderOps):
    args = []
    for lay in ops.layers:
        args.extend(list(lay))
    return args


def _fwd_pallas(x_t, ops: EncoderOps, n_valid, ghost_size, res_identity,
                interpret, dtype="float32", save_acts=False):
    """x_t: [C_in, B, N_PAD]. Returns (z [B, L], sums: list of 4-tuples)
    and, with save_acts, also (acts: per-layer [C_out, B, N_PAD] outputs,
    stats: per-layer 4-tuples of [8*n_blocks, C_out] per-ghost-block BN
    statistics) — the residuals the split backward reads instead of
    recomputing."""
    c_in, b, _ = x_t.shape
    bb = ghost_size
    n_blocks = b // bb
    n_layers = len(ops.layers)
    latent = ops.wp.shape[1]

    w_args = _ops_arrays(ops)
    w_specs = [_full_spec(a.shape) for a in w_args]

    out_shapes = [jax.ShapeDtypeStruct((b, latent), jnp.float32)]
    out_specs = [pl.BlockSpec((bb, latent), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for lay in ops.layers:
        c_out = lay.wt.shape[0]
        for _ in range(4):
            out_shapes.append(jax.ShapeDtypeStruct((c_out, 1), jnp.float32))
            out_specs.append(_full_spec((c_out, 1)))
    if save_acts:
        for lay in ops.layers:
            c_out = lay.wt.shape[0]
            out_shapes.append(
                jax.ShapeDtypeStruct((c_out, b, N_PAD), jnp.float32))
            out_specs.append(pl.BlockSpec((c_out, bb, N_PAD),
                                          lambda i: (0, i, 0),
                                          memory_space=pltpu.VMEM))
        for lay in ops.layers:
            c_out = lay.wt.shape[0]
            for _ in range(4):
                out_shapes.append(
                    jax.ShapeDtypeStruct((8 * n_blocks, c_out), jnp.float32))
                out_specs.append(pl.BlockSpec((8, c_out), lambda i: (i, 0),
                                              memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, bb, n_valid, res_identity,
                          _widen_dtype(dtype, interpret), save_acts),
        grid=(n_blocks,),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec((c_in, bb, N_PAD), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
            _full_spec(ops.wp.shape),
            _full_spec(ops.bp.shape),
        ],
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_t, *w_args, ops.wp, ops.bp)
    z = outs[0]
    sums = [tuple(outs[1 + 4 * l + k] for k in range(4))
            for l in range(n_layers)]
    if not save_acts:
        return z, sums
    acts = outs[1 + 4 * n_layers : 1 + 5 * n_layers]
    stat_flat = outs[1 + 5 * n_layers :]
    stats = [tuple(stat_flat[4 * l + k] for k in range(4))
             for l in range(n_layers)]
    return z, sums, acts, stats


def _bwd_split_pallas(x_t, dz, ops: EncoderOps, acts, stats, n_valid,
                      ghost_size, res_identity, interpret, dtype="float32"):
    """Split-mode backward: a projector kernel + one kernel per layer, dy
    passed between them through HBM. Each Mosaic payload stays small
    (~11 dots), which the remote compile helper handles where the mono
    backward (70 dots) gets OOM-killed; the price is the boundary
    activations/dy round-tripping HBM (~0.5-1 ms at B=2048)."""
    c_in0, b, _ = x_t.shape
    bb = ghost_size
    n_blocks = b // bb
    n_layers = len(ops.layers)
    latent = ops.wp.shape[1]

    kdt = _widen_dtype(dtype, interpret)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def act_spec(c):
        return pl.BlockSpec((c, bb, N_PAD), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def pad_spec_c(c):
        # one (8, C) block per grid step of an [8*n_blocks, C] array, the
        # value replicated over the 8 sublanes (Mosaic forbids (C, 1) lane
        # blocks and 1-sublane blocks)
        return pl.BlockSpec((8, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    d_layers = [None] * n_layers
    dwp = dbp = dy = None
    for l in reversed(range(n_layers)):
        lay = ops.layers[l]
        c_out = lay.wt.shape[0]
        c_in = lay.wt.shape[1]
        x_l = x_t if l == 0 else acts[l - 1]
        w_args = list(lay)
        out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                      for a in lay]
        out_specs = [_full_spec(a.shape) for a in lay]
        if l == n_layers - 1:
            # top layer: projector backward fused in (dy stays in VMEM)
            out_shapes += [
                jax.ShapeDtypeStruct(ops.wp.shape, jnp.float32),
                jax.ShapeDtypeStruct(ops.bp.shape, jnp.float32),
                jax.ShapeDtypeStruct((c_in, b, N_PAD), jnp.float32),
            ]
            out_specs += [
                _full_spec(ops.wp.shape),
                _full_spec(ops.bp.shape),
                act_spec(c_in),
            ]
            outs = pl.pallas_call(
                functools.partial(_top_layer_bwd_kernel, bb, n_valid,
                                  res_identity[l], kdt),
                grid=(n_blocks,),
                out_shape=tuple(out_shapes),
                in_specs=[
                    act_spec(c_in),
                    act_spec(c_out),
                    pl.BlockSpec((bb, latent), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    _full_spec(ops.wp.shape),
                    *[pad_spec_c(c_out) for _ in range(4)],
                    *[_full_spec(a.shape) for a in lay],
                ],
                out_specs=tuple(out_specs),
                compiler_params=cparams,
                interpret=interpret,
            )(x_l, acts[-1], dz, ops.wp, *stats[l], *w_args)
            d_layers[l] = LayerOps(*outs[:N_LAYER_OPS])
            dwp, dbp, dy = outs[N_LAYER_OPS:]
        else:
            out_shapes.append(
                jax.ShapeDtypeStruct((c_in, b, N_PAD), jnp.float32))
            out_specs.append(act_spec(c_in))
            outs = pl.pallas_call(
                functools.partial(_layer_bwd_kernel, bb, n_valid,
                                  res_identity[l], kdt),
                grid=(n_blocks,),
                out_shape=tuple(out_shapes),
                in_specs=[
                    act_spec(c_in),
                    act_spec(c_out),
                    *[pad_spec_c(c_out) for _ in range(4)],
                    *[_full_spec(a.shape) for a in lay],
                ],
                out_specs=tuple(out_specs),
                compiler_params=cparams,
                interpret=interpret,
            )(x_l, dy, *stats[l], *w_args)
            d_layers[l] = LayerOps(*outs[:N_LAYER_OPS])
            dy = outs[N_LAYER_OPS]
    return EncoderOps(layers=tuple(d_layers), wp=dwp, bp=dbp)


def _bwd_pallas(x_t, dz, ops: EncoderOps, n_valid, ghost_size, res_identity,
                interpret, dtype="float32"):
    """Mono backward wrapper: cotangents for every LayerOps field + (dwp,
    dbp)."""
    c_in, b, _ = x_t.shape
    bb = ghost_size
    n_blocks = b // bb
    n_layers = len(ops.layers)

    w_args = _ops_arrays(ops)
    w_specs = [_full_spec(a.shape) for a in w_args]

    out_shapes, out_specs = [], []
    for lay in ops.layers:
        for a in lay:
            out_shapes.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
            out_specs.append(_full_spec(a.shape))
    for a in (ops.wp, ops.bp):
        out_shapes.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
        out_specs.append(_full_spec(a.shape))

    latent = ops.wp.shape[1]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers, bb, n_valid, res_identity,
                          _widen_dtype(dtype, interpret)),
        grid=(n_blocks,),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec((c_in, bb, N_PAD), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, latent), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
            _full_spec(ops.wp.shape),
        ],
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            # the remat backward's live set (stored layer inputs + one
            # layer's transients + grad accumulators) exceeds the default
            # 16 MB scoped-vmem budget at ghost_size 32; v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_t, dz, *w_args, ops.wp)
    d_layers = tuple(
        LayerOps(*outs[N_LAYER_OPS * l : N_LAYER_OPS * (l + 1)])
        for l in range(n_layers)
    )
    return EncoderOps(layers=d_layers,
                      wp=outs[N_LAYER_OPS * n_layers],
                      bp=outs[N_LAYER_OPS * n_layers + 1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def fused_ghost_encode(x_t, ops, n_valid, ghost_size, res_identity,
                       interpret=False, dtype="float32", bwd_mode="split"):
    """Fused ghost-BN STSE encode. x_t: [C_in, B, N_PAD] (node-padded,
    channel-major); returns (z [B, latent] fp32, per-layer pre-BN sum
    4-tuples for the running-stat update).

    bwd_mode='split' (default) saves the layer-boundary activations +
    per-block BN statistics and runs one small backward kernel per layer;
    'mono' saves nothing and rematerializes the whole stack inside one big
    backward kernel (less HBM traffic, but a Mosaic payload the remote
    compile infrastructure chokes on — see _bwd_split_pallas).

    NOTE: the VJP returns a ZERO cotangent for x_t — the input is data
    (gathered windows), never a function of trainable parameters. Do not
    place differentiable computation upstream of x_t."""
    return _fwd_pallas(x_t, ops, n_valid, ghost_size, res_identity,
                       interpret, dtype)


def _fge_fwd(x_t, ops, n_valid, ghost_size, res_identity, interpret, dtype,
             bwd_mode):
    if bwd_mode == "split":
        z, sums, acts, stats = _fwd_pallas(
            x_t, ops, n_valid, ghost_size, res_identity, interpret, dtype,
            save_acts=True,
        )
        return (z, sums), (x_t, ops, acts, stats)
    out = _fwd_pallas(x_t, ops, n_valid, ghost_size, res_identity, interpret,
                      dtype)
    return out, (x_t, ops, None, None)


def _fge_bwd(n_valid, ghost_size, res_identity, interpret, dtype, bwd_mode,
             residuals, cts):
    x_t, ops, acts, stats = residuals
    dz, _ = cts  # stat-sum cotangents are structurally zero (non-diff path)
    if bwd_mode == "split":
        d_ops = _bwd_split_pallas(x_t, dz, ops, acts, stats, n_valid,
                                  ghost_size, res_identity, interpret, dtype)
    else:
        d_ops = _bwd_pallas(x_t, dz, ops, n_valid, ghost_size, res_identity,
                            interpret, dtype)
    return jnp.zeros_like(x_t), d_ops


fused_ghost_encode.defvjp(_fge_fwd, _fge_bwd)


def fused_stse_apply(
    params: Dict,
    batch_stats: Dict,
    x: jax.Array,
    ghost_size: int = 32,
    momentum: float = 0.9,
    interpret: bool = False,
    impl: str = "pallas",
    axis_name: Optional[str] = None,
    compute_dtype: str = "float32",
    bwd_mode: str = "split",
) -> Tuple[jax.Array, Dict]:
    """Drop-in train-mode STSE encode: [B, C_in, T, V] -> (z, new_batch_stats).

    Equivalent to model.apply(..., train=True, mutable=['batch_stats']) with
    ghost BatchNorm of size `ghost_size` (see module docstring); the running
    statistics are exact full-batch moments folded with flax's momentum EMA.

    impl='pallas' runs the fused kernels; impl='reference' runs the
    semantically-identical pure-jnp spec (any backend, used by the CPU mesh
    tests). axis_name: when called inside shard_map over a data axis, the
    running-statistic sums are psum'ed over it so every shard folds the
    exact full-global-batch moments.
    """
    b = x.shape[0]
    # The custom VJP returns a ZERO cotangent for the input (windows are
    # gathered data, never a function of trainable parameters). stop_gradient
    # makes that explicit at the API boundary: differentiable computation
    # upstream of x would otherwise silently receive zeros.
    x = jax.lax.stop_gradient(x)
    if impl == "reference":
        z, layer_sums = ghost_encode_reference(params, x, ghost_size)
        layer_sums = [
            {k: jax.lax.stop_gradient(v) for k, v in s.items()}
            for s in layer_sums
        ]
    else:
        b, c_in, t, v = x.shape
        n = t * v
        assert n <= N_PAD and b % ghost_size == 0, (b, ghost_size, n)
        ops = encoder_ops_from_tree(params, n)
        res_identity = has_identity_residual(params)
        in_dt, _store = _parse_dtype(compute_dtype)
        x_t = jnp.transpose(x.reshape(b, c_in, n), (1, 0, 2)).astype(in_dt)
        x_t = jnp.pad(x_t, ((0, 0), (0, 0), (0, N_PAD - n)))
        z, sums = fused_ghost_encode(x_t, ops, n, ghost_size, res_identity,
                                     interpret, compute_dtype, bwd_mode)
        cnt = jnp.asarray(b * n, jnp.float32)
        layer_sums = [
            {
                "tcn_sum": jax.lax.stop_gradient(s[0][:, 0]),
                "tcn_sumsq": jax.lax.stop_gradient(s[1][:, 0]),
                "res_sum": jax.lax.stop_gradient(s[2][:, 0]),
                "res_sumsq": jax.lax.stop_gradient(s[3][:, 0]),
                "count": cnt,
            }
            for s in sums
        ]
    if axis_name is not None:
        layer_sums = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, axis_name), layer_sums
        )
    new_stats = updated_batch_stats(batch_stats, params, layer_sums, momentum)
    return z, new_stats


def updated_batch_stats(
    batch_stats: Dict, params: Dict, layer_sums: List[Dict[str, jax.Array]],
    momentum: float = 0.9,
) -> Dict:
    """Fold the kernel's full-batch pre-BN sums into flax-style running
    statistics (momentum EMA of the biased batch mean/var, like
    nn.BatchNorm)."""
    new = jax.tree_util.tree_map(lambda a: a, batch_stats)  # shallow copy
    enc_old = batch_stats["encoder"]
    enc_new = dict(enc_old)
    for i, s in enumerate(layer_sums):
        name = f"layer_{i}"
        cnt = s["count"]
        site = dict(enc_old[name])

        def ema(old, mean, var):
            return (
                momentum * old["mean"] + (1 - momentum) * mean,
                momentum * old["var"] + (1 - momentum) * var,
            )

        t_mean = s["tcn_sum"] / cnt
        t_var = jnp.maximum(s["tcn_sumsq"] / cnt - t_mean * t_mean, 0.0)
        m, v = ema(enc_old[name]["tcn_bn"], t_mean, t_var)
        site["tcn_bn"] = {"mean": m, "var": v}
        if "residual_bn" in enc_old[name]:
            r_mean = s["res_sum"] / cnt
            r_var = jnp.maximum(s["res_sumsq"] / cnt - r_mean * r_mean, 0.0)
            m, v = ema(enc_old[name]["residual_bn"], r_mean, r_var)
            site["residual_bn"] = {"mean": m, "var": v}
        enc_new[name] = site
    out = dict(new)
    out["encoder"] = enc_new
    return out
