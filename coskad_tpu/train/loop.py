"""The training loop: one jitted step for all five COSKAD variants.

Replaces the reference's five Lightning modules + pl.Trainer with a single
functional loop (SURVEY.md section 7.1): the whole step — device-side batch
gather + affine augmentation, forward, loss, grads, Adam update, center/cov
accumulator updates — is one compiled XLA program over a (data, model) mesh.
Batches are index vectors; pose windows stay HBM-resident.

Semantic ordering per epoch mirrors Lightning 1.6's hook order (see
objectives.py docstring and SURVEY.md section 3.5):
  1. train epoch (uses state.center as-is),
  2. [VAE] mean_vector <- epoch latent mean (on_validation_start,
     spherical_vae.py:110-122),
  3. optional validation AUC with the *current* center,
  4. dynamic-center variants: center <- accumulated mean / Einstein midpoint
     with eps-clamp; mahalanobis: inv_cov <- inverse of accumulated
     covariance; reset accumulators.

The center initialization is an eval-mode full pass (BN running stats, like
the reference's `model.eval()` in setup — euclidean_encoder_staticCenter.py:
101-130) with globally-exact sums across data shards.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.device_pipeline import TrajectoryStore, gather_batch_from_store
from ..data.transforms import canonical_transforms, gather_batch
from ..data.windows import SegmentDataset
from ..geometry import poincare as hyp
from ..models import build_model
from ..parallel import mesh as pmesh
from ..score.aggregate import EvalResult, ScoringConfig, evaluate_windows
from ..score.masks import AVENUE_MASKED_CLIPS
from ..utils.logging import MetricLogger
from . import objectives, schedulers
from .state import TrainState, clamp_center, init_state


def model_kwargs_from_config(cfg: Config) -> dict:
    dtype = jnp.bfloat16 if cfg.run.compute_dtype == "bfloat16" else jnp.float32
    return dict(
        dtype=dtype,
        use_decoder=cfg.model.use_decoder,
        use_vae=cfg.model.use_vae,
        input_dim=cfg.model.num_coords,
        layer_channels=tuple(cfg.model.channels),
        hidden_dimension=cfg.model.h_dim,
        latent_dim=cfg.model.latent_dim,
        n_frames=cfg.data.seg_len,
        n_joints=cfg.data.n_joints,
        encoder_type=cfg.model.encoder_type,
        bn_mode=cfg.model.bn_mode,
        projector=cfg.model.projector,
        projector_hidden_layers=cfg.model.projector_hidden_layers,
        dropout=cfg.model.dropout,
        distribution=cfg.model.distribution,
        decoder_channels=cfg.model.decoder_channels,
        kappa_floor=cfg.model.kappa_floor,
    )


class Trainer:
    """Orchestrates fit/validate/predict for one config.

    Args:
        cfg: full configuration.
        train_ds: training SegmentDataset (windows resident once on device).
        val_ds: optional test-split SegmentDataset for validation AUC.
        ground_truths: {(scene, clip): labels} for validation scoring.
        mesh: optional jax.sharding.Mesh; defaults to all devices on 'data'.
    """

    def __init__(
        self,
        cfg: Config,
        train_ds: SegmentDataset,
        val_ds: Optional[SegmentDataset] = None,
        ground_truths: Optional[dict] = None,
        mesh=None,
        logger: Optional[MetricLogger] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else pmesh.create_mesh(
            cfg.run.data_parallel, cfg.run.model_parallel
        )
        self.model = build_model(**model_kwargs_from_config(cfg))
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.ground_truths = ground_truths or {}
        self.logger = logger or MetricLogger()
        self.trans_table = jnp.asarray(
            canonical_transforms(max(cfg.data.num_transform, 1))
        )
        self.batch_size = cfg.data.batch_size
        self._lr = cfg.opt.lr
        # Adam runs over ONE flat parameter vector instead of ~60 small
        # tensors: the model is <600k params, so the update is trivial FLOPs
        # but each per-tensor op is a separate kernel — profiling showed the
        # step's op-launch floor rivals its compute. Two flavors sharing the
        # SAME opt_state pytree (optax.flatten carries no state of its own,
        # so checkpoints are interchangeable):
        #   - self._tx_inner: the transform applied directly to a flat
        #     vector. The scanned epoch keeps params RAVELED across the whole
        #     scan (_train_epoch_impl), so per-step grads come out of
        #     autodiff already concatenated (the transpose of one in-trace
        #     unravel) and no per-step split/unflatten exists at all —
        #     optax.flatten paid a concat + split + per-leaf add every step.
        #     Measured (quiet-host A/B, v5e-1, B=2048): euclidean train step
        #     4.37 -> 4.01 ms (+8% train w/s); AE/VAE neutral (their step is
        #     decoder-compute-dominated). RESULTS.md round 3.
        #   - self.tx = optax.flatten(_tx_inner) for tree-shaped single-step
        #     calls (tests, graft entry) and the tensor-parallel path, where
        #     the projector kernels carry mesh shardings a raveled carry
        #     would discard.
        # `tx` is a property so replacing the optimizer (tests swap in SGD
        # via `trainer.tx = ...`) keeps BOTH flavors in sync; the two share
        # the same opt_state pytree (optax.flatten carries no state of its
        # own), so checkpoints are interchangeable between them.
        # inject_hyperparams sits INSIDE so opt_state.hyperparams (the lr
        # the schedulers mutate) keeps its path in both flavors.
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.opt.lr
        )
        # Flat-carry scanned epochs only when params are replicated (TP=1):
        # ravel_pytree would silently all-gather model-parallel shards.
        self._flat_carry = self.mesh.shape[pmesh.MODEL_AXIS] == 1

        # HBM-resident training data, replicated over the mesh (read-only).
        # Two pipelines: materialized windows (SegmentDataset) or the fused
        # device-side preprocessing over whole trajectories (TrajectoryStore,
        # data/device_pipeline.py — the BASELINE north star).
        self._pipeline = "store" if isinstance(train_ds, TrajectoryStore) else "windows"
        # Real raises, not asserts: these host-side safety nets must survive
        # python -O (same policy as device_pipeline.py:141-152).
        if val_ds is not None and (
            isinstance(val_ds, TrajectoryStore) != (self._pipeline == "store")
        ):
            raise ValueError(
                "train and validation datasets must use the same pipeline kind"
            )
        # The transform table is built from cfg.data.num_transform while the
        # index stream spans len(ds) = NW * ds.num_transform — a mismatch
        # would make jnp.take CLIP out-of-range transform rows (silently
        # scoring with the wrong affine matrix, round-5 review finding).
        # score_all on a num_transform=1 dataset (the serving raw-windows
        # path) stays valid: every trans_idx is 0 = the identity row.
        for name, ds in (("train", train_ds), ("validation", val_ds)):
            k = getattr(ds, "num_transform", None)
            if ds is not None and k not in (None, 1, cfg.data.num_transform):
                raise ValueError(
                    f"{name} dataset carries num_transform={k} but the "
                    f"config says {cfg.data.num_transform}; rebuild the "
                    "dataset with the config's transform count"
                )
        self.train_data = self._device_data(train_ds)
        self.val_data = self._device_data(val_ds) if val_ds is not None else None

        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=0,
            static_argnames=("frozen_bn",),
        )
        # Multi-step variants: one dispatch per epoch via lax.scan. Remote
        # TPU dispatch costs 10s of ms per call; scanning K steps inside one
        # jitted program amortizes it and lets XLA pipeline the whole epoch.
        self._train_epoch = jax.jit(
            self._train_epoch_impl, donate_argnums=0,
            static_argnames=("frozen_bn",),
        )
        self._embed_many = jax.jit(
            self._embed_many_impl, static_argnames=("window_shape",))
        self._score_fn = jax.jit(self._score_impl)
        # Fused scoring program: gather + eval forward + variant score for
        # [K, B] index chunks in ONE dispatch (remote TPU dispatch costs
        # 15-77 ms; the old embed-then-score pair paid it twice and
        # round-tripped latents through the host).
        self._score_many = jax.jit(
            self._score_many_impl, static_argnames=("window_shape",))
        self._epochs_done = 0
        # False routes the VAE through its deterministic mean path
        # (sample=False) instead of rsample in BOTH train and eval — the
        # torch-lockstep parity harness uses it (RNG streams cannot be
        # aligned). Default True matches the reference (spherical_vae
        # trains AND scores sampled latents). Separately,
        # cfg.eval.vae_sample=False flips only the EVAL forwards to the
        # posterior mean (the opt-in scoring stabilizer, RESULTS.md
        # round-5 "VAE stabilization"); training keeps sampling.
        self.vae_sample = True
        self._vae_sample_eval = cfg.eval.vae_sample
        # Plateau-scheduler state must survive the CLI's per-epoch
        # fit(state, epochs=1) calls, like the shuffle stream above.
        self._best_auc = -np.inf
        self._since_best = 0
        # Fused ghost-BN train kernel (kernels/stse_train.py): static
        # compatibility; the per-batch divisibility check happens at trace
        # time in _forward. Tensor parallelism shards the projector kernel,
        # which the fused kernel needs whole -> XLA path there.
        self._fused_compat = (
            cfg.run.fused_train != "off"
            and cfg.model.encoder_type == "sts_gcn"
            and cfg.model.projector == "linear"
            and cfg.model.dropout == 0
            and not cfg.model.use_decoder  # AE/VAE decoder: XLA path for now
            and self.mesh.shape[pmesh.MODEL_AXIS] == 1
        )
        if cfg.run.fused_train == "on" and not self._fused_compat:
            raise ValueError(
                "fused_train='on' requires sts_gcn encoder, linear projector, "
                "dropout 0, an encoder-only variant and model_parallel 1"
            )

    @property
    def tx(self):
        """Tree-shaped optimizer view: optax.flatten over the inner
        transform. Assigning a plain transform (tests swap in SGD) updates
        both this and the flat-vector flavor the scanned epoch uses."""
        return self._tx_flat

    @tx.setter
    def tx(self, transform):
        self._tx_inner = transform
        self._tx_flat = optax.flatten(transform)

    def _fused_apply(self, params, batch_stats, batch):
        """Fused-kernel train-mode encode, shard_map'ed over the data axis
        when the mesh has more than one data shard (params replicated,
        batch sharded, stat sums psum'ed so every shard folds global
        running statistics)."""
        from ..kernels.stse_train import fused_stse_apply

        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
        ghost = self.cfg.run.ghost_size
        cdtype = self.cfg.run.compute_dtype
        n_data = self.mesh.shape[pmesh.DATA_AXIS]
        if n_data == 1:
            return fused_stse_apply(
                params, batch_stats, batch, ghost_size=ghost, impl=impl,
                compute_dtype=cdtype,
            )
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            functools.partial(
                fused_stse_apply, ghost_size=ghost, impl=impl,
                axis_name=pmesh.DATA_AXIS, compute_dtype=cdtype,
            ),
            mesh=self.mesh,
            in_specs=(P(), P(), P(pmesh.DATA_AXIS)),
            out_specs=(P(pmesh.DATA_AXIS), P()),
            check_vma=False,
        )
        return fn(params, batch_stats, batch)

    def _fused_usable(self, batch) -> bool:
        """Trace-time check: fused path for this batch shape?"""
        if not self._fused_compat:
            return False
        b = batch.shape[0]
        n_data = self.mesh.shape[pmesh.DATA_AXIS]
        per_shard = b // n_data
        return b % n_data == 0 and per_shard % self.cfg.run.ghost_size == 0

    def _device_data(self, ds):
        if isinstance(ds, TrajectoryStore):
            return pmesh.device_put_replicated(
                (ds.traj,
                 jnp.asarray(ds.window_person),
                 jnp.asarray(ds.window_start)),
                self.mesh,
            )
        # Windows upload FLAT [N, C*T*V]: the row gather then reads 648-lane
        # rows (~84% tile utilization) instead of [C, 12, 18] blocks whose
        # V=18 minor dim wastes ~86% of every 128-lane tile (same physics as
        # the TrajectoryStore flat layout; gather_batch reshapes back).
        n = ds.data.shape[0]
        return pmesh.device_put_replicated(
            jnp.asarray(ds.data.reshape(n, -1)), self.mesh)

    # ------------------------------------------------------------ setup

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.run.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        rng, init_rng, sample_rng = jax.random.split(rng, 3)
        dummy = jnp.zeros(
            (2, self.cfg.model.num_coords, self.cfg.data.seg_len, self.cfg.data.n_joints),
            jnp.float32,
        )
        rngs = {"params": init_rng}
        if self.cfg.model.use_vae:
            rngs["sample"] = sample_rng
        # One compiled program, not eager per-op execution: eager init
        # through the remote-TPU tunnel paid ~hundreds of 15-77 ms
        # dispatches — 5.5 s of the offline-eval wall on the production
        # config (round-5 eval profile, RESULTS.md). Identical values (PRNG
        # semantics are jit-invariant); the compile persists in the cache.
        variables = jax.jit(self.model.init)(rngs, dummy)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # jit for the same reason as init: optax.flatten's eager ravel was
        # another ~2.3 s of tunnel dispatches on the eval wall.
        opt_state = jax.jit(self.tx.init)(params)
        state = init_state(
            params, batch_stats, opt_state, self.cfg.model.latent_dim, rng
        )
        # Lay out: params/state replicated (model-parallel layouts are applied
        # to the wide projector kernels inside shard_params).
        return self.attach_state(state)

    def schedule_state(self) -> dict:
        """Host-side schedule state that must ride in checkpoints for a
        resumed run to reproduce an uninterrupted one: the global epoch
        counter (epoch-indexed lr_schedule / freeze_bn_after / shuffle
        streams) and the ReduceLROnPlateau analogue's counters (the live LR
        itself is inside opt_state.hyperparams and is checkpointed with the
        TrainState)."""
        return {
            "epochs_done": int(self._epochs_done),
            "plateau_best_auc": float(self._best_auc),
            "plateau_since_best": int(self._since_best),
        }

    def restore_schedule_state(self, extra: dict) -> None:
        """Counterpart of schedule_state() for checkpoint resume. Falls back
        to extra['epoch'] + 1 for checkpoints written before schedule state
        was persisted (plateau counters then restart from scratch, the old
        behavior)."""
        if "epochs_done" in extra:
            self._epochs_done = int(extra["epochs_done"])
        elif "epoch" in extra:
            self._epochs_done = int(extra["epoch"]) + 1
        self._best_auc = float(extra.get("plateau_best_auc", -np.inf))
        self._since_best = int(extra.get("plateau_since_best", 0))

    def attach_state(self, state: TrainState) -> TrainState:
        """Re-lay a (restored) state onto the mesh. Checkpoint restore
        produces host numpy leaves; feeding them to the jitted programs
        directly would compile a second specialization for the unsharded
        layout."""
        params = pmesh.device_put_params(state.params, self.mesh)
        rest = pmesh.device_put_replicated(state.replace(params=None), self.mesh)
        return rest.replace(params=params)

    # ------------------------------------------------------------ jit bodies

    def _forward(self, params, batch_stats, batch, train: bool, rng=None,
                 frozen_bn: bool = False, vae_draws=None):
        # Fused ghost-BN Pallas path (train-mode, live statistics): the
        # whole encoder fwd(+custom-VJP bwd) runs as one kernel per
        # direction with VMEM-resident activations. Encoder-only variants
        # return the latent directly, so `out` IS z here.
        if train and not frozen_bn and self._fused_usable(batch):
            return self._fused_apply(params, batch_stats, batch)
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = {"train": train, "frozen_bn": frozen_bn}
        rngs = {}
        base = rng if rng is not None else jax.random.PRNGKey(0)
        if self.cfg.model.use_vae:
            rngs["sample"] = base
            kwargs["sample"] = self.vae_sample and (
                train or self._vae_sample_eval)
            if vae_draws is not None:  # lockstep-parity hook (see stse.py)
                kwargs["sample_draws"] = vae_draws
        if train and self.cfg.model.dropout > 0:
            rngs["dropout"] = jax.random.fold_in(base, 0x60)
        if train:
            out, mutated = self.model.apply(
                variables, batch, mutable=["batch_stats"], rngs=rngs, **kwargs
            )
            return out, mutated["batch_stats"]
        out = self.model.apply(variables, batch, rngs=rngs, **kwargs)
        return out, batch_stats

    @staticmethod
    def _window_shape_of(ds):
        """(C, T, V) of a materialized-window dataset; None for stores."""
        data = getattr(ds, "data", None)
        return None if data is None else tuple(data.shape[1:])

    def _gather(self, data, indices, window_shape=None):
        if self._pipeline == "store":
            traj, persons, starts = data
            return gather_batch_from_store(
                self.train_ds, traj, persons, starts, indices,
                self.trans_table, self.cfg.model.num_coords,
            )
        # Flat [N, C*T*V] uploads lose the window shape; default to the
        # train set's but let callers that gather OTHER datasets (val/eval)
        # pass the owning dataset's shape. A product mismatch would
        # otherwise surface as an opaque in-jit reshape error.
        ws = tuple(window_shape or self.train_ds.data.shape[1:])
        if data.ndim == 2 and data.shape[1] != int(np.prod(ws)):
            raise ValueError(
                f"flat window data has {data.shape[1]} features but "
                f"window_shape {ws} expects {int(np.prod(ws))}; pass the "
                "owning dataset's window shape to _gather/embed_all/score_all"
            )
        return gather_batch(
            data, indices, self.trans_table, self.cfg.model.num_coords,
            window_shape=ws,
        )

    def _train_step_impl(
        self, state: TrainState, data: jax.Array, indices: jax.Array,
        frozen_bn: bool = False, vae_draws=None, *, unravel=None,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """One SGD step. With `unravel` (the scanned flat-carry epoch),
        state.params is the raveled, tile-padded [rows, 1024] matrix:
        gradients are taken w.r.t. it directly (autodiff of the in-trace
        unravel emits the leaf-grad concatenation) and Adam applies to it
        with no per-step split/unflatten; the tree view exists only
        transiently inside loss_fn for the model apply."""
        rng, step_rng = jax.random.split(state.rng)
        batch = self._gather(data, indices)

        def loss_fn(p):
            params = unravel(p) if unravel is not None else p
            out, new_bs = self._forward(
                params, state.batch_stats, batch, train=True, rng=step_rng,
                frozen_bn=frozen_bn, vae_draws=vae_draws,
            )
            loss, metrics = objectives.compute_loss(
                self.cfg, out, batch, params, state.center, state.inv_cov,
                mean_vector=state.mean_vector,
            )
            z = objectives.latent_of(self.cfg.model.variant, out)
            if self.cfg.opt.contrastive_weight > 0:
                # Second, strongly-augmented view + InfoNCE (the reference's
                # double_item capability, fully in-jit).
                from ..data.augment_device import strong_augment
                from ..geometry.poincare import contrastive_loss

                k_aug, k_fwd = jax.random.split(jax.random.fold_in(step_rng, 1))
                batch2 = strong_augment(batch, k_aug)
                # frozen_bn must reach the second view too, or running
                # statistics keep mutating (with strong-augmentation
                # statistics, no less) after the freeze epoch (round-5
                # review finding).
                out2, new_bs = self._forward(
                    params, new_bs, batch2, train=True, rng=k_fwd,
                    frozen_bn=frozen_bn,
                )
                z2 = objectives.latent_of(self.cfg.model.variant, out2)
                l_con, _ = contrastive_loss(
                    z, z, z2, tau=self.cfg.opt.contrastive_tau,
                    hyp_c=self.cfg.opt.contrastive_hyp_c,
                )
                loss = loss + self.cfg.opt.contrastive_weight * l_con
                metrics["contrastive_loss"] = l_con
                metrics["loss"] = loss
            if self.cfg.model.use_vae and not self._vae_sample_eval:
                # Mean-scoring mode: the accumulated anchor must be the
                # posterior means it will score against (see the NOTE at
                # accumulate_stats below).
                z = out[2][0]
            return loss, (metrics, new_bs, z)

        (loss, (metrics, new_bs, z)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        tx = self._tx_inner if unravel is not None else self.tx
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = objectives.accumulate_stats(
            (state.acc_vec, state.acc_weight, state.acc_outer),
            self.cfg.model.variant,
            self.cfg.model.distance,
            z,
            state.center,
        )
        # NOTE on the VAE anchor: with eval.vae_sample=False the scoring
        # anchor must match what is scored — the POSTERIOR MEANS — so the
        # mean_vector accumulator uses them too (loss_fn returns z = mu in
        # that mode via latent_for_stats below); measured: a sampled-latent
        # anchor at kappa ~ 2 is 60-90% noise-cancelled (|mean_vector|
        # 0.08-0.4 on unit samples) and its direction jitters 12-24
        # deg/epoch (RESULTS.md round-5 "VAE stabilization").
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            rng=rng,
            acc_vec=acc[0],
            acc_weight=acc[1],
            acc_outer=acc[2],
        )
        return new_state, metrics

    def _train_epoch_impl(
        self, state: TrainState, data: jax.Array, indices: jax.Array,
        frozen_bn: bool = False,
    ):
        """Scan K train steps in one compiled program. indices: [K, B].

        With a flat carry (TP=1), params are raveled ONCE here — the scan
        carries a single matrix (one while-loop buffer instead of ~60,
        shrinking the per-step async-copy floor) and each step's Adam runs
        flat with no split/unflatten — then unraveled once on exit, so the
        caller-visible TrainState keeps its tree form.

        The carry is a zero-padded [rows, 1024] matrix with each LEAF packed
        into its own whole rows (1024 f32 = one (8,128) tile per row), NOT
        the bare concatenated [P] vector: every per-step elementwise op on
        it (Adam, the grad transpose) is tile-aligned, and rebuilding the
        tree slices row-ranges per leaf without ever materializing a 1-D
        view of the whole buffer. Both alternatives were profiled out on the
        AE at B=2048: the raw ravel_pytree vector AND a densely-packed
        matrix whose unravel went through `.reshape(-1)` each made XLA
        re-tile the full buffer as f32[P/2, 2] plus a layout copy every
        step (0.40 ms/step, round-3 trace at loop.py:445). Adam's moments
        ride the same transform at entry/exit; padding lanes stay exactly
        zero under Adam (zero grad -> zero moments -> zero update) and the
        equivalence to the tree path is asserted by
        tests/test_train.py::test_flat_carry_epoch_matches_tree_steps."""
        unravel = None
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        if self._flat_carry and all(l.dtype == jnp.float32 for l in leaves):
            lanes = 1024
            shapes = [l.shape for l in leaves]
            sizes = [l.size for l in leaves]
            row_counts = [-(-s // lanes) for s in sizes]
            starts = np.concatenate([[0], np.cumsum(row_counts)])
            rows = int(starts[-1])

            def to_mat(tree_leaves):
                blocks = [
                    jnp.pad(l.reshape(-1), (0, k * lanes - s)).reshape(k, lanes)
                    for l, s, k in zip(tree_leaves, sizes, row_counts)
                ]
                return jnp.concatenate(blocks, axis=0)

            def unravel(m):
                outs = [
                    m[starts[i]:starts[i + 1]].reshape(-1)[:sizes[i]]
                    .reshape(shapes[i])
                    for i in range(len(sizes))
                ]
                return jax.tree_util.tree_unflatten(treedef, outs)

            def opt_to_mat(x):
                # optax.flatten state leaves (Adam mu/nu) are the raveled
                # [P] vector; re-pack them leaf-aligned like the params.
                if x.ndim == 1 and x.shape[0] == sum(sizes):
                    bounds = np.concatenate([[0], np.cumsum(sizes)])
                    return to_mat([
                        x[bounds[i]:bounds[i + 1]].reshape(shapes[i])
                        for i in range(len(sizes))
                    ])
                return x

            def from_mat(x):
                if x.ndim == 2 and x.shape == (rows, lanes):
                    return jnp.concatenate(
                        [l.reshape(-1) for l in
                         jax.tree_util.tree_leaves(unravel(x))]
                    )
                return x

            state = state.replace(
                params=to_mat(leaves),
                opt_state=jax.tree_util.tree_map(opt_to_mat, state.opt_state),
            )

        def body(carry, idx):
            new_carry, metrics = self._train_step_impl(
                carry, data, idx, frozen_bn=frozen_bn, unravel=unravel
            )
            return new_carry, metrics

        state, metrics = jax.lax.scan(body, state, indices)
        if unravel is not None:
            state = state.replace(
                params=unravel(state.params),
                opt_state=jax.tree_util.tree_map(from_mat, state.opt_state),
            )
        return state, metrics

    def _embed_step_impl(
        self, params, batch_stats, data, indices, rng, window_shape=None
    ) -> Tuple[jax.Array, jax.Array]:
        """Eval-mode (latents, per-window reconstruction MSE) for a batch.

        rec_err is zeros for encoder-only variants; for decoder variants it
        feeds the reference's 'rec' / 'rec+hyp' scoring modes
        (windows_based_loss_rec_and_hy, utils/eval_utils.py:77-106)."""
        batch = self._gather(data, indices, window_shape=window_shape)
        out, _ = self._forward(params, batch_stats, batch, train=False, rng=rng)
        z = objectives.latent_of(self.cfg.model.variant, out)
        if self.cfg.model.use_decoder:
            recon = out[1]
            rec_err = jnp.mean((recon - batch) ** 2, axis=(1, 2, 3))
        else:
            rec_err = jnp.zeros(z.shape[0], jnp.float32)
        return z, rec_err

    def _embed_many_impl(self, params, batch_stats, data, indices, rng,
                         window_shape=None):
        """Scan embedding over [K, B] index chunks -> ([K, B, D], [K, B])."""

        def body(i, idx):
            z, rec = self._embed_step_impl(
                params, batch_stats, data, idx, jax.random.fold_in(rng, i),
                window_shape=window_shape,
            )
            return i + 1, (z, rec)

        _, (zs, recs) = jax.lax.scan(body, 0, indices)
        return zs, recs

    def _score_impl(self, z, center, inv_cov, mean_vector) -> jax.Array:
        return objectives.window_scores(self.cfg, z, center, inv_cov, mean_vector)

    def _score_many_impl(self, params, batch_stats, data, indices, rng,
                         center, inv_cov, mean_vector, window_shape=None):
        """Scan (gather + eval forward + window score) over [K, B] chunks ->
        ([K, B] scores, [K, B] rec errors). The scoring analogue of
        _embed_many with the distance fused into the scanned body, so a full
        scoring pass is one device dispatch and latents never leave HBM.
        Matches the reference's predict-then-score split
        (eval_COSKAD.py:115-116 + windows_based_loss_*) semantically."""

        def body(i, idx):
            z, rec = self._embed_step_impl(
                params, batch_stats, data, idx, jax.random.fold_in(rng, i),
                window_shape=window_shape,
            )
            s = objectives.window_scores(
                self.cfg, z, center, inv_cov, mean_vector
            )
            return i + 1, (s, rec)

        _, (scores, recs) = jax.lax.scan(body, 0, indices)
        return scores, recs

    # ------------------------------------------------------------ embedding

    @staticmethod
    def _fetch_global(arr) -> np.ndarray:
        """Materialize a (possibly batch-sharded) device array on the host.

        Single-process: plain np.asarray. Multi-process (multi-host DCN,
        parallel/mesh.py::initialize_distributed): np.asarray cannot read
        the non-addressable shards living on other hosts' devices, so
        allgather them first — every host then runs the identical host-side
        aggregation (center init, validation AUC), which keeps multi-host
        results byte-equal to single-process ones. Cost: one DCN allgather
        of the latents/scores per eval pass, once per epoch."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))

    def _chunked_indices(self, n: int):
        """[K, B] wrap-padded index chunks on the data-sharded layout, plus
        K — the shared front half of embed_all/score_all (one copy so a fix
        to the padding/sharding cannot miss the other path)."""
        bs = self.batch_size
        k = (n + bs - 1) // bs
        idx = (np.arange(k * bs) % n).reshape(k, bs)  # wrap-pad the tail
        idx_dev = jax.device_put(
            jnp.asarray(idx),
            jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(None, pmesh.DATA_AXIS)
            ),
        )
        return idx_dev, k

    def embed_all(
        self, state: TrainState, ds: SegmentDataset, data, return_rec: bool = False
    ):
        """Latents (and optionally per-window reconstruction errors) for
        every (window x transform) item: pad to a whole number of batches and
        run ONE scanned device call."""
        n = len(ds)
        idx_dev, k = self._chunked_indices(n)
        rng = jax.random.fold_in(state.rng, 7)
        zs, recs = self._embed_many(
            state.params, state.batch_stats, data, idx_dev, rng,
            window_shape=self._window_shape_of(ds))
        z = self._fetch_global(zs).reshape(k * self.batch_size, -1)[:n]
        if return_rec:
            return z, self._fetch_global(recs).reshape(k * self.batch_size)[:n]
        return z

    def score_all(self, state: TrainState, ds: SegmentDataset, data):
        """Anomaly scores (and reconstruction errors) for every (window x
        transform) item in ONE scanned device dispatch (embed + variant
        distance fused — see _score_many_impl). Returns ([N] scores,
        [N] rec errors) as numpy."""
        n = len(ds)
        idx_dev, k = self._chunked_indices(n)
        rng = jax.random.fold_in(state.rng, 7)
        scores, recs = self._score_many(
            state.params, state.batch_stats, data, idx_dev, rng,
            state.center, state.inv_cov, state.mean_vector,
            window_shape=self._window_shape_of(ds),
        )
        return (self._fetch_global(scores).reshape(k * self.batch_size)[:n],
                self._fetch_global(recs).reshape(k * self.batch_size)[:n])

    # ------------------------------------------------------------ center init

    def initialize_center(self, state: TrainState) -> TrainState:
        """Full eval-mode pass over the train set; exact global center.

        Euclidean/VAE: c = clamp(mean(z)); hyperbolic: c = Einstein midpoint
        of exp-mapped latents (hyperbolic_encoder.py:108-133). Mahalanobis
        additionally needs the latent covariance around c.
        """
        z = self.embed_all(state, self.train_ds, self.train_data)
        if self.cfg.model.variant == "hyperbolic":
            z_h = np.asarray(hyp.project(hyp.expmap0(jnp.asarray(z))))
            ws, w = hyp.streaming_midpoint_stats(jnp.asarray(z_h))
            c = hyp.midpoint_from_stats(ws, w)
            c = jnp.asarray(c)
            if not bool(jnp.all(jnp.abs(c) < 1.0)):  # survives python -O
                raise ValueError("hyperbolic center left the Poincaré ball")
        else:
            c = jnp.asarray(z.mean(axis=0, dtype=np.float64), jnp.float32)
            c = clamp_center(c, self.cfg.opt.center_tolerance)
        # Install with the mesh sharding: a center without it would silently
        # recompile the whole epoch program on its next call (the jit sees a
        # different input layout).
        state = state.replace(center=pmesh.device_put_replicated(c, self.mesh))
        if self.cfg.model.distance == "mahalanobis":
            d = z - np.asarray(c)
            cov = (d.T @ d) / (len(z) - 1)
            cov = self._shrink_cov(cov)
            state = state.replace(
                inv_cov=pmesh.device_put_replicated(
                    jnp.asarray(np.linalg.inv(cov), jnp.float32), self.mesh
                )
            )
        return state

    def _shrink_cov(self, cov):
        """Optional shrinkage toward the scaled identity mu*I
        (mu = trace/d) before inverting: opt.cov_shrinkage in [0, 1), OFF
        (0.0) by default = the reference's raw-inverse semantics
        (euclidean_encoder_staticCenter.py:133-148). Tames the measured
        cond(cov) ~ 2.4e4 noise amplification on mahalanobis scores
        (tests/test_multiprocess.py). Works on numpy and jnp inputs."""
        lam = self.cfg.opt.cov_shrinkage
        if lam <= 0.0:
            return cov
        d = cov.shape[-1]
        xp = jnp if isinstance(cov, jax.Array) else np
        mu = xp.trace(cov) / d
        return (1.0 - lam) * cov + lam * mu * xp.eye(d, dtype=cov.dtype)

    # ------------------------------------------------------------ epoch end

    def apply_epoch_updates(self, state: TrainState) -> TrainState:
        variant = self.cfg.model.variant
        if variant in ("euclidean_dynamic",):
            c = clamp_center(
                state.acc_vec / state.acc_weight, self.cfg.opt.center_tolerance
            )
            state = state.replace(center=c)
        elif variant == "hyperbolic":
            # static_center isn't used by the reference hyperbolic configs;
            # the midpoint recompute is the default behaviour.
            c = hyp.midpoint_from_stats(state.acc_vec, state.acc_weight)
            state = state.replace(center=c)
        if self.cfg.model.distance == "mahalanobis":
            cov = state.acc_outer / (state.acc_weight - 1.0)
            state = state.replace(inv_cov=jnp.linalg.inv(self._shrink_cov(cov)))
        return state.reset_accumulators()

    def update_mean_vector(self, state: TrainState) -> TrainState:
        if self.cfg.model.variant != "vae":
            return state
        return state.replace(mean_vector=state.acc_vec / state.acc_weight)

    # ------------------------------------------------------------ validation

    def validate(self, state: TrainState) -> Optional[EvalResult]:
        if self.val_ds is None or not self.ground_truths:
            return None
        scores, rec = self.score_all(state, self.val_ds, self.val_data)
        if self.cfg.model.variant == "autoencoder":
            # The reference's in-training AE validation scores windows by
            # reconstruction MSE (windows_based_loss_rec_and_hy with its
            # default loss_type='rec'; euclidean_autoencoder.py:197); its
            # offline eval scores by latent distance (rec_loss_weight=0 ->
            # 'hyp', eval_COSKAD.py:66-69). Both behaviours are preserved.
            scores = rec
        k = max(self.cfg.data.num_transform, 1)
        avenue_masks = (
            AVENUE_MASKED_CLIPS if self.cfg.data.dataset_choice == "HR-Avenue" else {}
        )
        # Shared-meta form: metadata is identical across the k transforms
        # (scores are transform-major), so pass the base arrays once.
        return evaluate_windows(
            scores,
            None,
            self.val_ds.meta,
            self.val_ds.frame_ids,
            self.ground_truths,
            ScoringConfig(num_transform=k, pad_size=self.cfg.eval.pad_size),
            avenue_clip_masks=avenue_masks,
        )

    # ------------------------------------------------------------ fit

    def fit(
        self, state: Optional[TrainState] = None, epochs: Optional[int] = None
    ) -> Tuple[TrainState, Dict]:
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.opt.epochs
        if state is None:
            state = self.init_state()
            state = self.initialize_center(state)
        n = len(self.train_ds)
        # A logical dataset smaller than one batch still trains: shrink the
        # step batch to the dataset (the reference's loader would emit one
        # short batch; we need a fixed shape for jit), rounded to a multiple
        # of the data-mesh axis so the batch-sharded device_put stays valid.
        data_axis = self.mesh.shape[pmesh.DATA_AXIS]
        bs = min(self.batch_size, max(n // data_axis, 1) * data_axis)
        steps_per_epoch = max(n // bs, 1)
        history = {"validation_auc": [], "loss": []}
        # Named per-epoch LR schedule (OptConfig.lr_schedule). When set it
        # owns the learning rate and the plateau reducer is disabled; torch
        # semantics (scheduler.step() at epoch end) mean lr(epoch e) =
        # schedule(e), which is what installing before the epoch gives us.
        schedule = (
            schedulers.build_schedule(
                cfg.opt.lr_schedule, cfg.opt.lr, cfg.opt.epochs, cfg.opt.lr_decay
            )
            if cfg.opt.lr_schedule
            else None
        )

        for local_epoch in range(epochs):
            epoch = self._epochs_done + local_epoch
            if schedule is not None:
                self._lr = float(schedule(epoch))
                # Install with the mesh sharding — an unsharded scalar in the
                # donated opt_state would silently recompile the epoch program.
                state.opt_state.hyperparams["learning_rate"] = (
                    pmesh.device_put_replicated(
                        jnp.asarray(self._lr, jnp.float32), self.mesh
                    )
                )
            # Per-epoch derived permutation: epoch e always shuffles with
            # rng((seed, e)), so (a) repeated fit(state, epochs=1) calls (the
            # CLI's per-epoch checkpoint loop) never replay a permutation and
            # (b) a --resume'd run consumes the SAME index stream as an
            # uninterrupted one — crash-recovery reproduces the original run
            # exactly (cli/supervise.py, tests/test_supervise.py).
            perm = np.random.default_rng((cfg.run.seed, epoch)).permutation(n)
            # Wrap-pad modulo n: only active when n < data_axis (bs rounded
            # UP past n so the batch-sharded device_put stays valid); the
            # plain slice would reshape-crash there (round-5 review). The
            # n % bs tail drop in the common case is the documented
            # deviation PARITY.md lists (fixed shapes for jit; the
            # reference's loader emits a ragged final batch).
            flat = perm[np.arange(steps_per_epoch * bs) % n]
            idx = flat.reshape(steps_per_epoch, bs)
            idx_dev = jax.device_put(
                jnp.asarray(idx),
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec(None, pmesh.DATA_AXIS)
                ),
            )
            # One dispatch for the whole epoch (lax.scan over steps).
            frozen = (
                cfg.run.freeze_bn_after >= 0
                and epoch >= cfg.run.freeze_bn_after
            )
            state, metrics = self._train_epoch(
                state, self.train_data, idx_dev, frozen_bn=frozen
            )
            metrics = {k: np.asarray(v) for k, v in metrics.items()}  # [K]
            for step in range(steps_per_epoch):
                global_step = epoch * steps_per_epoch + step + 1
                if global_step % self.logger.every_n_steps == 0:
                    self.logger.log(
                        {k: float(v[step]) for k, v in metrics.items()}, global_step
                    )
            history["loss"].append(float(metrics["loss"].mean()))

            state = self.update_mean_vector(state)
            result = None
            if cfg.opt.validation and (epoch + 1) % cfg.run.validate_every == 0:
                result = self.validate(state)
            if result is not None:
                auc = result.auc
                history["validation_auc"].append(auc)
                self.logger.log(
                    {"validation_auc": auc, "epoch": epoch}, int(state.step), force=True
                )
                # ReduceLROnPlateau(mode='max') analogue (skipped when a
                # named schedule owns the lr)
                if schedule is not None:
                    pass
                elif auc > self._best_auc:
                    self._best_auc, self._since_best = auc, 0
                else:
                    self._since_best += 1
                    if self._since_best > cfg.opt.plateau_patience:
                        # Reduce from the LIVE lr (survives --resume, where
                        # self._lr would be stale) and install it with the
                        # mesh sharding — an unsharded scalar in the donated
                        # opt_state would silently recompile the epoch
                        # program on the next call.
                        live = float(
                            jax.device_get(
                                state.opt_state.hyperparams["learning_rate"]
                            )
                        )
                        self._lr = max(
                            live * cfg.opt.plateau_factor, cfg.opt.min_lr
                        )
                        state.opt_state.hyperparams["learning_rate"] = (
                            pmesh.device_put_replicated(
                                jnp.asarray(self._lr, jnp.float32), self.mesh
                            )
                        )
                        self._since_best = 0
            state = self.apply_epoch_updates(state)
            if cfg.model.variant == "hyperbolic":
                # epoch-end center norms the reference logs
                # (hyperbolic_encoder.py:179-186): euclidean norm of the ball
                # point and its geodesic distance from the origin.
                c = state.center
                self.logger.log(
                    {
                        "center/eucl": float(jnp.linalg.norm(c)),
                        "center/hyp": float(hyp.dist0(c)),
                    },
                    int(state.step),
                    force=True,
                )
        self._epochs_done += epochs
        return state, history
