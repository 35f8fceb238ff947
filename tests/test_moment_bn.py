"""Moment-space BatchNorm (models/stsgcn.py:_moment_dense_bn) equivalence.

bn_mode='moment' must be a pure implementation change: identical variable
tree, identical initialization, identical forward/gradients/running-stat
updates (to fp32 tolerance) vs the plain flax nn.Dense + nn.BatchNorm pair
(bn_mode='flax'). The point of the mode is performance: train-mode BN
statistics come from the input's [C, C] moment matrix, so the pre-BN
activations are never materialized (DESIGN.md section 6 — the ~8 ms/step
bandwidth-bound chunk of the train step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.models import build_model
from coskad_tpu.models.stsgcn import STSGCNStack


def _stack(bn_mode, dtype=jnp.float32):
    return STSGCNStack(
        channel_schedule=[8, 4, 8], time_dim=6, joints_dim=5,
        dropout=0.0, dtype=dtype, bn_mode=bn_mode,
    )


def _init(model, x):
    return model.init(jax.random.PRNGKey(0), x)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(16, 6, 5, 2)).astype(np.float32))


def test_identical_variable_tree_and_init(data):
    v_m = _init(_stack("moment"), data)
    v_f = _init(_stack("flax"), data)
    paths_m = [p for p, _ in jax.tree_util.tree_flatten_with_path(v_m)[0]]
    paths_f = [p for p, _ in jax.tree_util.tree_flatten_with_path(v_f)[0]]
    assert paths_m == paths_f
    for lm, lf in zip(jax.tree_util.tree_leaves(v_m), jax.tree_util.tree_leaves(v_f)):
        np.testing.assert_array_equal(np.asarray(lm), np.asarray(lf))


def test_eval_forward_matches(data):
    variables = _init(_stack("flax"), data)
    # non-trivial running stats
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    bs = jax.tree_util.tree_map(
        lambda x: x + 0.3 * np.random.default_rng(1).normal(size=x.shape).astype(np.float32) ** 2,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    y_f = _stack("flax").apply(variables, data)
    y_m = _stack("moment").apply(variables, data)
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_f), rtol=2e-5, atol=2e-6)


def test_train_step_outputs_and_stats_match(data):
    variables = _init(_stack("flax"), data)
    y_f, mut_f = _stack("flax").apply(
        variables, data, train=True, mutable=["batch_stats"]
    )
    y_m, mut_m = _stack("moment").apply(
        variables, data, train=True, mutable=["batch_stats"]
    )
    # The E[h^2]-E[h]^2 association order differs from flax's elementwise
    # path by fp32 cancellation noise on a handful of elements.
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_f), rtol=5e-4, atol=3e-5)
    for (pm, lm), (pf, lf) in zip(
        jax.tree_util.tree_flatten_with_path(mut_m["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(mut_f["batch_stats"])[0],
    ):
        assert pm == pf
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(lf), rtol=5e-5, atol=5e-6,
            err_msg=str(pm),
        )


def test_gradients_match(data):
    variables = _init(_stack("flax"), data)

    def loss(params, mode):
        y, _ = _stack(mode).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            data, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(y**2)

    g_f = jax.grad(lambda p: loss(p, "flax"))(variables["params"])
    g_m = jax.grad(lambda p: loss(p, "moment"))(variables["params"])
    for (pm, lm), (pf, lf) in zip(
        jax.tree_util.tree_flatten_with_path(g_m)[0],
        jax.tree_util.tree_flatten_with_path(g_f)[0],
    ):
        assert pm == pf
        np.testing.assert_allclose(
            np.asarray(lm), np.asarray(lf), rtol=2e-3, atol=2e-5,
            err_msg=str(pm),
        )


def test_frozen_bn_path_matches(data):
    variables = _init(_stack("flax"), data)
    y_f, mut_f = _stack("flax").apply(
        variables, data, train=True, frozen_bn=True, mutable=["batch_stats"]
    )
    y_m, mut_m = _stack("moment").apply(
        variables, data, train=True, frozen_bn=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(y_m), np.asarray(y_f), rtol=2e-5, atol=2e-6)
    # frozen BN must not touch the running statistics in either mode
    for lm, lf in zip(
        jax.tree_util.tree_leaves(mut_m["batch_stats"]),
        jax.tree_util.tree_leaves(variables["batch_stats"]),
    ):
        np.testing.assert_array_equal(np.asarray(lm), np.asarray(lf))


@pytest.mark.parametrize("variant_kw", [
    dict(),  # STSE
    dict(use_decoder=True),  # STSAE
    dict(use_decoder=True, use_vae=True, distribution="ps"),  # STSVAE
])
def test_full_model_moment_vs_flax(variant_kw, data):
    kw = dict(
        input_dim=2, layer_channels=(8, 4), hidden_dimension=8, latent_dim=4,
        n_frames=6, n_joints=5, encoder_type="sts_gcn", projector="linear",
    )
    x = jnp.transpose(data, (0, 3, 1, 2))  # NTVC -> NCTV
    m_f = build_model(bn_mode="flax", **variant_kw, **kw)
    m_m = build_model(bn_mode="moment", **variant_kw, **kw)
    rngs = {"params": jax.random.PRNGKey(0)}
    if variant_kw.get("use_vae"):
        rngs["sample"] = jax.random.PRNGKey(1)
    v = m_f.init(rngs, x)
    kwargs = {"train": True, "mutable": ["batch_stats"]}
    if variant_kw.get("use_vae"):
        kwargs["rngs"] = {"sample": jax.random.PRNGKey(2)}
        kwargs["sample"] = False  # deterministic path for comparability
    out_f, mut_f = m_f.apply(v, x, **kwargs)
    out_m, mut_m = m_m.apply(v, x, **kwargs)
    for a, b in zip(jax.tree_util.tree_leaves(out_m), jax.tree_util.tree_leaves(out_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_bfloat16_moment_traces_with_fp32_stats(data):
    """bf16 compute: output dtype matches the flax path and the running
    statistics stay float32. Trace-only — this XLA-CPU build cannot
    execute bf16 dots (numeric bf16 validation runs on the TPU,
    see RESULTS.md head-to-head)."""
    variables = _init(_stack("flax"), data)
    out_f = jax.eval_shape(
        lambda v, x: _stack("flax", dtype=jnp.bfloat16).apply(
            v, x, train=True, mutable=["batch_stats"]),
        variables, data,
    )
    out_m = jax.eval_shape(
        lambda v, x: _stack("moment", dtype=jnp.bfloat16).apply(
            v, x, train=True, mutable=["batch_stats"]),
        variables, data,
    )
    assert out_m[0].shape == out_f[0].shape
    # PReLU's fp32 alpha promotes the layer output in BOTH modes; what
    # matters is the two modes agree exactly on dtype semantics.
    assert out_m[0].dtype == out_f[0].dtype
    for leaf in jax.tree_util.tree_leaves(out_m[1]):
        assert leaf.dtype == jnp.float32


def test_auto_mode_dispatch(data):
    """'auto' == flax pair for live-stats training, == moment fold when
    running statistics are in use."""
    variables = _init(_stack("flax"), data)
    y_auto_train, _ = _stack("auto").apply(
        variables, data, train=True, mutable=["batch_stats"]
    )
    y_flax_train, _ = _stack("flax").apply(
        variables, data, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_array_equal(np.asarray(y_auto_train), np.asarray(y_flax_train))
    y_auto_eval = _stack("auto").apply(variables, data)
    y_moment_eval = _stack("moment").apply(variables, data)
    np.testing.assert_array_equal(np.asarray(y_auto_eval), np.asarray(y_moment_eval))


def test_graph_modes_equivalent(data):
    """Combined (T*V, T*V) contraction == the two separable einsums."""
    from coskad_tpu.models.stsgcn import SpaceTimeGraphConv

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(8, 6, 5, 12)).astype(np.float32)
    )
    sep = SpaceTimeGraphConv(6, 5, graph_mode="separable")
    comb = SpaceTimeGraphConv(6, 5, graph_mode="combined")
    v = sep.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(comb.apply(v, x)), np.asarray(sep.apply(v, x)),
        rtol=2e-5, atol=2e-6,
    )
    g_s = jax.grad(lambda p: jnp.sum(sep.apply({"params": p}, x) ** 2))(v["params"])
    g_c = jax.grad(lambda p: jnp.sum(comb.apply({"params": p}, x) ** 2))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_c), jax.tree_util.tree_leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
