"""Import reference PyTorch-Lightning checkpoints into coskad_tpu.

A user of the reference COSKAD repo has Lightning ``.ckpt`` files (torch
``state_dict`` with the model under a ``model.`` prefix, plus the registered
buffers ``c`` / ``inv_cov_matrix`` / ``mean_vector`` that ride inside it —
models/sts/ae.py:69-73, models/sts/vae.py:57-60) and, for robust-normalized
datasets, a fitted sklearn RobustScaler pickle (utils/dataset.py:176-179).
This module converts both into a coskad_tpu msgpack checkpoint that
``cli/eval`` (and ``cli/train --resume`` for fine-tuning) load directly:

    python -m coskad_tpu.cli.convert --config cfg.yaml \
        --ckpt ref_lightning.ckpt [--scaler robust.pkl] [--out out.ckpt]

Weight-layout translation (verified against the reference torch modules by
tests/test_convert_reference.py, forward-parity on random inputs):

  * ST-GCNN layers: learnable adjacencies ``gcn.A``/``gcn.T`` copy verbatim;
    the 1x1 Conv2d "tcn" becomes a Dense kernel (``w[:, :, 0, 0].T``); BN
    weight/bias -> scale/bias, running stats -> batch_stats; PReLU's
    1-element weight -> the scalar ``alpha``; the channel-change residual
    branch maps the same way (models/graph_layers/stsgcn.py:56-110).
  * Projector (``btlnk``) and the VAE's identity-projector heads
    (``fc_mean``/``fc_var``): torch flattens the hidden channel-major
    (C, T, V) (models/sts/ae.py:97-105); we flatten (T, V, C), so the
    Linear weight is permuted before transposing into a kernel.
  * ``rev_btlnk``: our ReverseProjector kernel is [latent, H*T*V] in
    channel-major flat order — exactly the torch Linear weight transposed;
    the bias copies verbatim (models/sts/ae.py:200-230).
  * Plain-GCN encoders (learnable/static): per-layer ``gcn.weight`` is
    already [in, out] (graph_layers/{gcn,learnable_gcn}.py einsum
    orientation) and copies verbatim; the learnable adjacency ``gcn.Adj``
    maps to our per-layer ``adj_i``. The static encoder's fixed adjacency
    is not a weight — both sides rebuild it deterministically.
  * MLP projectors map structurally: the Linear/BatchNorm1d entries found
    under the projector subtree are taken in index order and assigned to
    ``hidden_i``/``bn_i``/``out``. (The shipped reference MLP cannot even be
    constructed — STSE._set_projector_type passes ``hidden_size=`` to a
    constructor taking ``hidden_layers``, SURVEY.md §0.1 — so this mapping
    targets the evident intent, which is also what our MLPHead implements.)

Not convertible: ``encoder_type: st_gcn`` (broken twice in the reference
snapshot — models/graph_layers/stgcn.py:101,168,298 — so no such checkpoint
can exist).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

# Keys that exist in reference checkpoints but carry no convertible state.
_IGNORED_SUFFIXES = ("num_batches_tracked",)
_IGNORED_KEYS = ("threshold_dist",)  # registered but never consumed (vae.py:60)


class ConversionError(ValueError):
    pass


# --------------------------------------------------------------------- load


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Read a torch/Lightning checkpoint into {key: np.ndarray}.

    Accepts a Lightning checkpoint (dict with 'state_dict'), a bare
    state_dict, or an nn.Module save. Strips the Lightning module's
    ``model.`` prefix so keys address the bare STSE/STSAE/STSVAE. Returns
    (state_dict, meta) where meta carries the Lightning 'epoch' if present.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    meta: dict = {}
    if hasattr(obj, "state_dict"):  # a pickled nn.Module
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
        if isinstance(obj.get("epoch"), int):
            meta["epoch"] = obj["epoch"]
    elif isinstance(obj, dict):
        sd = obj
    else:
        raise ConversionError(f"unrecognized checkpoint object: {type(obj)}")
    out = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[str(k)] = np.asarray(arr)
    if out and all(k.startswith("model.") for k in out):
        out = {k[len("model."):]: v for k, v in out.items()}
    return out, meta


# ----------------------------------------------------------------- helpers


def _assign(tree: dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise ConversionError(
                f"template has no node {'/'.join(path)} (at {p!r}; "
                f"have {sorted(node)})"
            )
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise ConversionError(
            f"template has no leaf {'/'.join(path)} (have {sorted(node)})")
    tmpl = np.asarray(node[leaf])
    value = np.asarray(value, dtype=tmpl.dtype).reshape(tmpl.shape)
    node[leaf] = value


def _pop(sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise ConversionError(f"reference checkpoint is missing key {key!r}")
    return sd.pop(key)


def _conv1x1_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight [out, in, 1, 1] -> Dense kernel [in, out]."""
    if w.ndim != 4 or w.shape[2:] != (1, 1):
        raise ConversionError(f"expected a 1x1 conv weight, got {w.shape}")
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _linear_ctv_kernel(w: np.ndarray, c: int, t: int, v: int) -> np.ndarray:
    """torch Linear weight [out, C*T*V] over a channel-major flatten ->
    our kernel [T*V*C, out] over the (T, V, C) flatten."""
    out = w.shape[0]
    if w.shape[1] != c * t * v:
        raise ConversionError(
            f"linear fan-in {w.shape[1]} != C*T*V = {c}*{t}*{v}")
    w4 = w.reshape(out, c, t, v).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(w4.reshape(out, -1).T)


# --------------------------------------------------------- per-block mappers


def _map_stsgcn_stack(
    sd: Dict[str, np.ndarray],
    src: str,
    params: dict,
    stats: dict,
    in_channels: int,
    schedule: List[int],
) -> None:
    """Map a torch Encoder/Decoder (Sequential of ST_GCNN_layer under
    ``<src>.model``) onto our STSGCNStack ``layer_{i}`` tree."""
    for i, out_ch in enumerate(schedule):
        lp, ls = params[f"layer_{i}"], stats[f"layer_{i}"]
        key = f"{src}.model.{i}"
        _assign(lp, ["gcn", "a_adj"], _pop(sd, f"{key}.gcn.A"))
        _assign(lp, ["gcn", "t_adj"], _pop(sd, f"{key}.gcn.T"))
        _assign(lp, ["tcn_dense", "kernel"],
                _conv1x1_kernel(_pop(sd, f"{key}.tcn.0.weight")))
        if f"{key}.tcn.0.bias" in sd:
            _assign(lp, ["tcn_dense", "bias"], _pop(sd, f"{key}.tcn.0.bias"))
        _assign(lp, ["tcn_bn", "scale"], _pop(sd, f"{key}.tcn.1.weight"))
        _assign(lp, ["tcn_bn", "bias"], _pop(sd, f"{key}.tcn.1.bias"))
        _assign(ls, ["tcn_bn", "mean"], _pop(sd, f"{key}.tcn.1.running_mean"))
        _assign(ls, ["tcn_bn", "var"], _pop(sd, f"{key}.tcn.1.running_var"))
        _assign(lp, ["prelu", "alpha"], _pop(sd, f"{key}.prelu.weight"))
        has_residual = f"{key}.residual.0.weight" in sd
        if has_residual != (in_channels != out_ch):
            raise ConversionError(
                f"{key}: residual branch presence ({has_residual}) does not "
                f"match the channel schedule {in_channels}->{out_ch}")
        if has_residual:
            _assign(lp, ["residual_dense", "kernel"],
                    _conv1x1_kernel(_pop(sd, f"{key}.residual.0.weight")))
            if f"{key}.residual.0.bias" in sd:
                _assign(lp, ["residual_dense", "bias"],
                        _pop(sd, f"{key}.residual.0.bias"))
            _assign(lp, ["residual_bn", "scale"],
                    _pop(sd, f"{key}.residual.1.weight"))
            _assign(lp, ["residual_bn", "bias"],
                    _pop(sd, f"{key}.residual.1.bias"))
            _assign(ls, ["residual_bn", "mean"],
                    _pop(sd, f"{key}.residual.1.running_mean"))
            _assign(ls, ["residual_bn", "var"],
                    _pop(sd, f"{key}.residual.1.running_var"))
        in_channels = out_ch


def _map_plain_gcn_encoder(
    sd: Dict[str, np.ndarray],
    params: dict,
    n_layers: int,
    learnable: bool,
) -> None:
    """Map EncoderLearnablePlainGCN / EncoderStaticPlainGCN (``gcns``
    ModuleList, alternative_components.py:147-159,246-258). ``gcn.weight``
    is [in, out] in the reference einsum orientation — verbatim copy."""
    for i in range(n_layers):
        key = f"encoder.gcns.{i}.gcn"
        _assign(params["encoder"][f"layer_{i}"], ["weight"],
                _pop(sd, f"{key}.weight"))
        if f"{key}.bias" in sd:
            _assign(params["encoder"][f"layer_{i}"], ["bias"],
                    _pop(sd, f"{key}.bias"))
        if learnable:
            _assign(params["encoder"], [f"adj_{i}"], _pop(sd, f"{key}.Adj"))


def _mlp_groups(sd: Dict[str, np.ndarray], prefix: str):
    """Collect the Linear ([out, in] 2-D weight) and BatchNorm1d (1-D weight
    + running stats) entries under ``prefix`` in index order, popping them
    from sd. Returns (linears, bns) as lists of dicts."""
    pat = re.compile(re.escape(prefix) + r"\.(.*?)(\d+)\.(weight|bias|running_mean|running_var)$")
    found: Dict[int, dict] = {}
    for k in sorted(list(sd)):
        m = pat.match(k)
        if m:
            idx = int(m.group(2))
            found.setdefault(idx, {})[m.group(3)] = sd.pop(k)
    linears, bns = [], []
    for idx in sorted(found):
        entry = found[idx]
        if "running_mean" in entry:
            bns.append(entry)
        elif entry.get("weight") is not None and entry["weight"].ndim == 2:
            linears.append(entry)
        else:
            raise ConversionError(
                f"unrecognized module at {prefix}[{idx}]: keys {sorted(entry)}")
    return linears, bns


def _map_mlp_head(
    sd: Dict[str, np.ndarray],
    src: str,
    params: dict,
    stats: dict,
    first_ctv: Optional[Tuple[int, int, int]],
) -> None:
    """Map a torch Sequential MLP (Linear [+ BN + ReLU] per hidden layer,
    final Linear — components.py:209-226 intent) onto MLPHead
    (hidden_i/bn_i/out). first_ctv: (C, T, V) when the first Linear reads
    the channel-major flat hidden and needs the flatten-order permute."""
    linears, bns = _mlp_groups(sd, src)
    n_hidden = len(linears) - 1
    expected = {f"hidden_{i}" for i in range(n_hidden)} | {"out"}
    expected |= {f"bn_{i}" for i in range(n_hidden)}
    have = set(params)
    if expected != have:
        raise ConversionError(
            f"{src}: reference MLP has {n_hidden} hidden layers but the "
            f"config's projector_hidden_layers built {sorted(have)}")
    if len(bns) != n_hidden:
        # MLPHead applies BN after every hidden Linear (components.py:215-217
        # intent); a BN-free torch MLP has no faithful mapping onto it.
        raise ConversionError(
            f"{src}: found {len(bns)} BN entries for {n_hidden} hidden layers")
    for i, lin in enumerate(linears):
        name = f"hidden_{i}" if i < n_hidden else "out"
        w = lin["weight"]
        if i == 0 and first_ctv is not None:
            kernel = _linear_ctv_kernel(w, *first_ctv)
        else:
            kernel = np.ascontiguousarray(w.T)
        _assign(params[name], ["kernel"], kernel)
        if "bias" in lin:
            _assign(params[name], ["bias"], lin["bias"])
    for i, bn in enumerate(bns):
        _assign(params[f"bn_{i}"], ["scale"], bn["weight"])
        _assign(params[f"bn_{i}"], ["bias"], bn["bias"])
        _assign(stats[f"bn_{i}"], ["mean"], bn["running_mean"])
        _assign(stats[f"bn_{i}"], ["var"], bn["running_var"])


# ----------------------------------------------------------------- convert


def convert_state_dict(
    sd: Dict[str, np.ndarray], model
) -> Tuple[dict, dict, dict, Dict[str, np.ndarray]]:
    """Convert a reference torch state_dict into (params, batch_stats,
    buffers, passthrough) matching the flax `model` (STSE/STSAE/STSVAE from
    coskad_tpu.models). `sd` is consumed; leftover unconvertible keys raise
    unless ignorable. `buffers` carries center/inv_cov/mean_vector arrays
    for the TrainState; `passthrough` carries torch-only bookkeeping
    (num_batches_tracked counters, threshold_dist) that has no coskad
    equivalent but must survive a round-trip export byte-exactly."""
    import jax
    import jax.numpy as jnp

    from .models import STSAE, STSVAE

    sd = dict(sd)
    et = model.encoder_type.lower()
    if et == "st_gcn":
        raise ConversionError(
            "encoder_type 'st_gcn' is unconvertible: the reference snapshot "
            "cannot construct it (models/graph_layers/stgcn.py:101,168,298; "
            "SURVEY.md §0.1), so no such checkpoint exists")
    if et not in ("sts_gcn", "learnable_gcn", "static_gcn"):
        raise ConversionError(f"no conversion rule for encoder_type {et!r}")

    c_in, t, v = model.input_dim, model.n_frames, model.n_joints
    hidden, latent = model.hidden_dimension, model.latent_dim
    is_vae = isinstance(model, STSVAE)
    is_ae = isinstance(model, STSAE)

    dummy = jnp.zeros((2, c_in, t, v), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0)}
    if is_vae:
        rngs["sample"] = jax.random.PRNGKey(1)
    variables = model.init(rngs, dummy)
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(
        np.asarray, dict(variables.get("batch_stats", {})))

    # Buffers -> TrainState fields (registered on the torch model,
    # models/sts/ae.py:69-73, vae.py:57-60).
    buffers = {}
    for src_key, dst_key in (("c", "center"), ("inv_cov_matrix", "inv_cov"),
                             ("mean_vector", "mean_vector")):
        if src_key in sd:
            val = np.asarray(sd.pop(src_key), np.float32)
            # TrainState shapes: center/mean_vector [D] (the reference's
            # mean_vector is registered [1, D], vae.py:58), inv_cov [D, D].
            shape = (latent, latent) if dst_key == "inv_cov" else (latent,)
            buffers[dst_key] = val.reshape(shape)
    if (is_vae and model.distribution == "ps"
            and "mean_vector" not in buffers):
        # Structural in the reference, not a bad file: the 'ps' VAE never
        # REGISTERS mean_vector (models/sts/vae.py:57-58 registers it only
        # for 'normal'); training assigns it as a plain attribute
        # (spherical_vae.py:113), so no ps checkpoint can carry the scoring
        # anchor — the reference's own offline eval would AttributeError on
        # it (eval_COSKAD.py:191). cli.eval recomputes the anchor from the
        # eval split's latents (the same empirical mean the reference's
        # in-session hooks use) when it finds it zeroed; warn so a library
        # caller scoring the raw TrainState knows why scores would be
        # constant otherwise.
        print("[convert] note: 'ps' VAE checkpoints cannot carry "
              "mean_vector (never registered by the reference); cli.eval "
              "recomputes the scoring anchor from the eval split's latents")

    schedule = list(model.layer_channels) + [hidden]
    if et == "sts_gcn":
        _map_stsgcn_stack(
            sd, "encoder", params["encoder"], stats.get("encoder", {}),
            c_in, schedule)
    else:
        _map_plain_gcn_encoder(
            sd, params, len(schedule), learnable=(et == "learnable_gcn"))

    proj = model.projector.lower()
    ctv = (hidden, t, v)
    if is_vae:
        # Identity projector: heads read the flat hidden channel-major
        # (models/sts/vae.py:151-156); 'mlp': heads read the projected latent.
        head_ctv = ctv if proj != "mlp" else None
        for head in ("fc_mean", "fc_var"):
            w = _pop(sd, f"{head}.weight")
            kernel = (_linear_ctv_kernel(w, *ctv) if head_ctv is not None
                      else np.ascontiguousarray(w.T))
            _assign(params[head], ["kernel"], kernel)
            if f"{head}.bias" in sd:
                _assign(params[head], ["bias"], _pop(sd, f"{head}.bias"))
        if proj == "mlp":
            _map_mlp_head(sd, "btlnk", params["btlnk"],
                          stats.get("btlnk", {}), first_ctv=ctv)
    elif proj == "mlp":
        _map_mlp_head(sd, "btlnk", params["btlnk"], stats.get("btlnk", {}),
                      first_ctv=ctv)
    else:
        _assign(params["btlnk"], ["kernel"],
                _linear_ctv_kernel(_pop(sd, "btlnk.weight"), *ctv))
        if "btlnk.bias" in sd:
            _assign(params["btlnk"], ["bias"], _pop(sd, "btlnk.bias"))

    if is_ae:
        # rev_btlnk: our kernel is [latent, H*T*V] channel-major == weight.T
        # (models/stse.py ReverseProjector docstring; reference de-flatten
        # models/sts/ae.py:222-226).
        w = _pop(sd, "rev_btlnk.weight")
        if w.shape != (hidden * t * v, latent):
            raise ConversionError(
                f"rev_btlnk weight {w.shape} != ({hidden * t * v}, {latent})")
        _assign(params["rev_btlnk"], ["kernel"], np.ascontiguousarray(w.T))
        if "rev_btlnk.bias" in sd:
            _assign(params["rev_btlnk"], ["bias"], _pop(sd, "rev_btlnk.bias"))
        dec_schedule = list(model.decoder_channels or model.layer_channels[::-1])
        _map_stsgcn_stack(
            sd, "decoder", params["decoder"], stats.get("decoder", {}),
            hidden, dec_schedule + [c_in])

    # Torch-only bookkeeping: keep it so a later export round-trips exactly
    # (BN step counters matter to a torch-side fine-tune with momentum=None;
    # threshold_dist is a registered-but-unused VAE buffer, vae.py:60). The
    # static encoder's persisted fixed adjacency also passes through — both
    # sides rebuild it deterministically (models/graph.py), but carrying the
    # original keeps the round-trip byte-exact.
    passthrough = {
        k: sd.pop(k) for k in list(sd)
        if k.endswith(_IGNORED_SUFFIXES) or k in _IGNORED_KEYS
        # Exactly the one persisted buffer (alternative_components.py:230):
        # a suffix match would also swallow per-layer learnable adjacencies
        # (encoder.gcns.{i}.gcn.Adj) when a learnable_gcn ckpt is converted
        # with a static_gcn config, hiding the mapping gap the completeness
        # guard below exists to catch.
        or (et == "static_gcn" and k == "encoder.Adj")
    }
    if sd:
        raise ConversionError(
            f"unconverted reference keys (mapping gap?): {sorted(sd)}")
    return params, stats, buffers, passthrough


def convert_checkpoint(
    ckpt_path: str,
    cfg,
    out_path: Optional[str] = None,
    scaler_path: Optional[str] = None,
    allow_missing_scaler: bool = False,
) -> str:
    """Full conversion: reference Lightning ckpt (+ optional robust.pkl
    sklearn scaler pickle) -> coskad_tpu msgpack checkpoint at `out_path`
    (default <ckpt_dir>/converted.ckpt), loadable by cli/eval --ckpt and
    cli/train --resume.

    A robust-normalized config REQUIRES the train-fitted scaler — without
    it, eval would silently re-fit a scaler on the test split and score in
    a different coordinate system than the checkpoint was trained in; this
    raises instead (override with allow_missing_scaler=True)."""
    if (scaler_path is None and not allow_missing_scaler
            and cfg.data.normalization_strategy == "robust"):
        raise ConversionError(
            "this config uses normalization_strategy 'robust': pass the "
            "reference run's fitted-scaler pickle (exp_dir/.../robust.pkl, "
            "utils/dataset.py:176-179) via scaler_path/--scaler, or force "
            "with allow_missing_scaler/--allow-missing-scaler (eval would "
            "then re-fit a scaler on the test split — NOT the coordinate "
            "system the checkpoint was trained in)")
    import jax
    import optax

    from .models import build_model
    from .train import checkpoint
    from .train.loop import model_kwargs_from_config
    from .train.state import init_state

    model = build_model(**model_kwargs_from_config(cfg))
    sd, meta = load_torch_state_dict(ckpt_path)
    params, stats, buffers, passthrough = convert_state_dict(sd, model)

    # Must match Trainer's checkpointed opt_state layout exactly: the
    # Trainer wraps the inner transform in optax.flatten (train/loop.py
    # tx setter), so mu/nu are single flat vectors. Initializing the
    # un-flattened optimizer here would produce tree-shaped mu/nu that
    # flax's from_state_dict restores WITHOUT a structure check — a
    # converted ckpt used with `cli.train --resume` would then crash (or
    # worse) inside the jitted epoch on the mu/grads tree mismatch.
    tx = optax.flatten(
        optax.inject_hyperparams(optax.adam)(learning_rate=cfg.opt.lr))
    opt_state = tx.init(params)
    state = init_state(params, stats, opt_state, cfg.model.latent_dim,
                       jax.random.PRNGKey(cfg.run.seed))
    state = state.replace(**{k: np.asarray(val) for k, val in buffers.items()})

    scaler = None
    if scaler_path:
        scaler = load_sklearn_scaler(scaler_path)

    out_path = out_path or os.path.join(cfg.ckpt_dir, "converted.ckpt")
    extra = {"epoch": int(meta.get("epoch", -1)),
             "converted_from": os.path.abspath(ckpt_path)}
    if passthrough:
        extra["torch_passthrough"] = {
            k: np.asarray(v) for k, v in passthrough.items()}
    return checkpoint.save(out_path, state, cfg=cfg, scaler=scaler, extra=extra)


# ------------------------------------------------------------------ export


def _dense_to_conv1x1(kernel: np.ndarray) -> np.ndarray:
    """Dense kernel [in, out] -> torch Conv2d weight [out, in, 1, 1]."""
    return np.ascontiguousarray(kernel.T)[:, :, None, None]


def _kernel_to_linear_ctv(k: np.ndarray, c: int, t: int, v: int) -> np.ndarray:
    """Inverse of _linear_ctv_kernel: our kernel [T*V*C, out] over the
    (T, V, C) flatten -> torch Linear weight [out, C*T*V] channel-major."""
    out = k.shape[1]
    w4 = k.T.reshape(out, t, v, c).transpose(0, 3, 1, 2)
    return np.ascontiguousarray(w4.reshape(out, -1))


def _export_stsgcn_stack(
    sd: Dict[str, np.ndarray],
    src: str,
    params: dict,
    stats: dict,
    in_channels: int,
    schedule: List[int],
) -> None:
    zero = np.zeros((), np.int64)
    for i, out_ch in enumerate(schedule):
        lp, ls = params[f"layer_{i}"], stats[f"layer_{i}"]
        key = f"{src}.model.{i}"
        sd[f"{key}.gcn.A"] = np.asarray(lp["gcn"]["a_adj"])
        sd[f"{key}.gcn.T"] = np.asarray(lp["gcn"]["t_adj"])
        sd[f"{key}.tcn.0.weight"] = _dense_to_conv1x1(np.asarray(lp["tcn_dense"]["kernel"]))
        if "bias" in lp["tcn_dense"]:
            sd[f"{key}.tcn.0.bias"] = np.asarray(lp["tcn_dense"]["bias"])
        sd[f"{key}.tcn.1.weight"] = np.asarray(lp["tcn_bn"]["scale"])
        sd[f"{key}.tcn.1.bias"] = np.asarray(lp["tcn_bn"]["bias"])
        sd[f"{key}.tcn.1.running_mean"] = np.asarray(ls["tcn_bn"]["mean"])
        sd[f"{key}.tcn.1.running_var"] = np.asarray(ls["tcn_bn"]["var"])
        sd[f"{key}.tcn.1.num_batches_tracked"] = zero
        sd[f"{key}.prelu.weight"] = np.asarray(lp["prelu"]["alpha"]).reshape(1)
        if in_channels != out_ch:
            sd[f"{key}.residual.0.weight"] = _dense_to_conv1x1(
                np.asarray(lp["residual_dense"]["kernel"]))
            if "bias" in lp["residual_dense"]:
                sd[f"{key}.residual.0.bias"] = np.asarray(
                    lp["residual_dense"]["bias"])
            sd[f"{key}.residual.1.weight"] = np.asarray(lp["residual_bn"]["scale"])
            sd[f"{key}.residual.1.bias"] = np.asarray(lp["residual_bn"]["bias"])
            sd[f"{key}.residual.1.running_mean"] = np.asarray(
                ls["residual_bn"]["mean"])
            sd[f"{key}.residual.1.running_var"] = np.asarray(
                ls["residual_bn"]["var"])
            sd[f"{key}.residual.1.num_batches_tracked"] = zero
        in_channels = out_ch


def export_state_dict(
    model,
    params: dict,
    stats: dict,
    buffers: Dict[str, np.ndarray],
    distance: str = "euclidean",
) -> Dict[str, np.ndarray]:
    """Inverse of convert_state_dict: flax params/batch_stats/buffers -> a
    reference-format torch state_dict (bare model keys, loadable strict into
    the shipped models/sts classes where they construct). Lets a TPU-trained
    checkpoint flow back into the reference torch ecosystem."""
    from .models import STSAE, STSVAE

    et = model.encoder_type.lower()
    if et not in ("sts_gcn", "learnable_gcn", "static_gcn"):
        raise ConversionError(f"no export rule for encoder_type {et!r}")
    c_in, t, v = model.input_dim, model.n_frames, model.n_joints
    hidden, latent = model.hidden_dimension, model.latent_dim
    is_vae = isinstance(model, STSVAE)
    is_ae = isinstance(model, STSAE)
    ctv = (hidden, t, v)
    sd: Dict[str, np.ndarray] = {}

    sd["c"] = np.asarray(buffers.get("center", np.zeros(latent, np.float32)))
    if distance.lower() == "mahalanobis":
        sd["inv_cov_matrix"] = np.asarray(
            buffers.get("inv_cov", np.zeros((latent, latent), np.float32)))
    if is_vae:
        if model.distribution == "normal":
            sd["mean_vector"] = np.asarray(
                buffers.get("mean_vector", np.zeros(latent, np.float32))
            ).reshape(1, latent)
        sd["threshold_dist"] = np.zeros((), np.float32)

    consumed = set()  # top-level params subtrees the mapping actually read
    schedule = list(model.layer_channels) + [hidden]
    expected_encoder = {f"layer_{i}" for i in range(len(schedule))}
    if et == "learnable_gcn":
        expected_encoder |= {f"adj_{i}" for i in range(len(schedule))}
    if set(params["encoder"]) != expected_encoder:
        raise ConversionError(
            f"encoder params {sorted(params['encoder'])} do not match the "
            f"config's layer schedule (expected {sorted(expected_encoder)}) "
            "— wrong --config for this checkpoint?")
    consumed.add("encoder")
    if et == "sts_gcn":
        _export_stsgcn_stack(sd, "encoder", params["encoder"],
                             stats.get("encoder", {}), c_in, schedule)
    else:
        for i in range(len(schedule)):
            key = f"encoder.gcns.{i}.gcn"
            layer = params["encoder"][f"layer_{i}"]
            sd[f"{key}.weight"] = np.asarray(layer["weight"])
            if "bias" in layer:
                sd[f"{key}.bias"] = np.asarray(layer["bias"])
            if et == "learnable_gcn":
                sd[f"{key}.Adj"] = np.asarray(params["encoder"][f"adj_{i}"])
        if et == "static_gcn":
            # The reference registers its fixed space-time adjacency as a
            # persistent buffer (alternative_components.py:230); emit the
            # deterministically-rebuilt table so strict load succeeds.
            from .models.graph import build_spacetime_adjacency

            sd["encoder.Adj"] = np.asarray(
                build_spacetime_adjacency(t, v), np.float32)

    proj = model.projector.lower()

    def _export_mlp(dst_prefix: str, p: dict, s: dict, first_ctv):
        # Reference MLP intent layout (components.py:209-226): Linear + BN1d
        # + ReLU per hidden layer under `net`, then the final Linear.
        n_hidden = sum(1 for name in p if name.startswith("hidden_"))
        for i in range(n_hidden):
            w = np.asarray(p[f"hidden_{i}"]["kernel"])
            w = (_kernel_to_linear_ctv(w, *first_ctv) if i == 0 and first_ctv
                 else np.ascontiguousarray(w.T))
            sd[f"{dst_prefix}.net.{3 * i}.weight"] = w
            if "bias" in p[f"hidden_{i}"]:
                sd[f"{dst_prefix}.net.{3 * i}.bias"] = np.asarray(
                    p[f"hidden_{i}"]["bias"])
            bn = f"{dst_prefix}.net.{3 * i + 1}"
            sd[f"{bn}.weight"] = np.asarray(p[f"bn_{i}"]["scale"])
            sd[f"{bn}.bias"] = np.asarray(p[f"bn_{i}"]["bias"])
            sd[f"{bn}.running_mean"] = np.asarray(s[f"bn_{i}"]["mean"])
            sd[f"{bn}.running_var"] = np.asarray(s[f"bn_{i}"]["var"])
            sd[f"{bn}.num_batches_tracked"] = np.zeros((), np.int64)
        w = np.asarray(p["out"]["kernel"])
        w = (_kernel_to_linear_ctv(w, *first_ctv)
             if n_hidden == 0 and first_ctv else np.ascontiguousarray(w.T))
        sd[f"{dst_prefix}.net.{3 * n_hidden}.weight"] = w
        if "bias" in p["out"]:
            sd[f"{dst_prefix}.net.{3 * n_hidden}.bias"] = np.asarray(
                p["out"]["bias"])

    if is_vae:
        head_ctv = ctv if proj != "mlp" else None
        for head in ("fc_mean", "fc_var"):
            k = np.asarray(params[head]["kernel"])
            sd[f"{head}.weight"] = (
                _kernel_to_linear_ctv(k, *ctv) if head_ctv is not None
                else np.ascontiguousarray(k.T))
            if "bias" in params[head]:
                sd[f"{head}.bias"] = np.asarray(params[head]["bias"])
            consumed.add(head)
        if proj == "mlp":
            _export_mlp("btlnk", params["btlnk"], stats.get("btlnk", {}), ctv)
            consumed.add("btlnk")
    elif proj == "mlp":
        _export_mlp("btlnk", params["btlnk"], stats.get("btlnk", {}), ctv)
        consumed.add("btlnk")
    else:
        sd["btlnk.weight"] = _kernel_to_linear_ctv(
            np.asarray(params["btlnk"]["kernel"]), *ctv)
        if "bias" in params["btlnk"]:
            sd["btlnk.bias"] = np.asarray(params["btlnk"]["bias"])
        consumed.add("btlnk")

    if is_ae:
        sd["rev_btlnk.weight"] = np.ascontiguousarray(
            np.asarray(params["rev_btlnk"]["kernel"]).T)
        if "bias" in params["rev_btlnk"]:
            sd["rev_btlnk.bias"] = np.asarray(params["rev_btlnk"]["bias"])
        dec_schedule = list(model.decoder_channels or model.layer_channels[::-1])
        _export_stsgcn_stack(sd, "decoder", params["decoder"],
                             stats.get("decoder", {}), hidden,
                             dec_schedule + [c_in])
        consumed |= {"rev_btlnk", "decoder"}

    # Mirror of the import direction's leftover guard: any params subtree
    # the mapping never read means the --config does not describe this
    # checkpoint (e.g. a trained STSAE exported with use_decoder unset
    # would otherwise silently drop its decoder and still strict-load).
    unread = set(params) - consumed
    if unread:
        raise ConversionError(
            f"checkpoint has params the config's model does not map: "
            f"{sorted(unread)} — wrong --config for this checkpoint?")
    return {k: np.asarray(val, np.float32) if val.dtype != np.int64 else val
            for k, val in sd.items()}


def export_checkpoint(ckpt_path: str, cfg, out_path: str) -> str:
    """coskad_tpu msgpack checkpoint -> reference-format torch/Lightning
    checkpoint ({'state_dict': {'model.<k>': tensor}, 'epoch': N}), loadable
    strict by the shipped reference model classes.

    Checkpoints that came FROM the reference carry their torch-only
    bookkeeping (BN num_batches_tracked, threshold_dist, persisted
    adjacency buffers) in extra['torch_passthrough']; it is re-applied here
    so a reference -> coskad -> reference round-trip is byte-exact even for
    trained checkpoints. An embedded fitted RobustScaler is written to
    ``<out_path>.robust.pkl`` as a pickled sklearn RobustScaler (the file
    the reference's loader expects as exp_dir/robust.pkl,
    utils/dataset.py:176-179)."""
    import torch

    from .models import build_model
    from .train import checkpoint
    from .train.loop import model_kwargs_from_config

    model = build_model(**model_kwargs_from_config(cfg))
    payload = checkpoint.read_payload(ckpt_path)
    state = payload["state"]
    extra = payload.get("extra", {})
    buffers = {k: np.asarray(state[k]) for k in
               ("center", "inv_cov", "mean_vector") if k in state}
    sd = export_state_dict(model, state["params"],
                           state.get("batch_stats", {}) or {}, buffers,
                           distance=cfg.model.distance)
    for k, v in extra.get("torch_passthrough", {}).items():
        sd[k] = np.asarray(v)
    out = {"state_dict": {f"model.{k}": torch.tensor(v) for k, v in sd.items()},
           "epoch": int(extra.get("epoch", -1))}
    torch.save(out, out_path)
    if "scaler" in payload:
        _write_sklearn_scaler(payload["scaler"], out_path + ".robust.pkl")
        print(f"[coskad] fitted scaler -> {out_path}.robust.pkl (place it as "
              "the reference run's exp_dir/robust.pkl)")
    elif cfg.data.normalization_strategy == "robust":
        print("[coskad] WARNING: robust-normalized config but no fitted "
              "scaler in the checkpoint — the reference side will re-fit "
              "its own and scores will NOT match this run")
    return out_path


def _write_sklearn_scaler(scaler_payload: dict, path: str) -> None:
    """Embedded scaler arrays -> a pickled fitted sklearn RobustScaler (the
    object type the reference pickles/loads, utils/dataset.py:176-179)."""
    import pickle

    from sklearn.preprocessing import RobustScaler

    sk = RobustScaler(quantile_range=(10.0, 90.0))
    sk.center_ = np.asarray(scaler_payload["center"], np.float64)
    sk.scale_ = np.asarray(scaler_payload["scale"], np.float64)
    sk.n_features_in_ = sk.center_.shape[0]
    with open(path, "wb") as f:
        pickle.dump(sk, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_sklearn_scaler(path: str):
    """Read the reference's fitted-RobustScaler pickle
    (utils/dataset.py:176-179) into a RobustScalerState."""
    import pickle

    from .data.normalize import RobustScalerState

    with open(path, "rb") as f:
        obj = pickle.load(f)
    center = getattr(obj, "center_", None)
    scale = getattr(obj, "scale_", None)
    if center is None or scale is None:
        raise ConversionError(
            f"{path} does not hold a fitted sklearn RobustScaler "
            f"(center_/scale_ missing on {type(obj)})")
    return RobustScalerState(center=np.asarray(center, np.float64),
                             scale=np.asarray(scale, np.float64))
