"""Profiling/debug harness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.utils import profiling


def test_timer_and_throughput():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    t = profiling.Timer("mul")
    for _ in range(3):
        with t.measure(result=f(x)):
            pass
    stats = t.stats()
    assert stats["mul/count"] == 3 and stats["mul/mean_s"] >= 0
    wps = profiling.throughput(f, x, items_per_call=128, iters=5)
    assert wps > 0


def test_debug_nans_raises():
    f = jax.jit(lambda x: jnp.log(x))
    with profiling.debug_nans(True):
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(f(jnp.asarray(-1.0)))
    # outside the scope it doesn't raise
    assert np.isnan(float(f(jnp.asarray(-1.0))))


def test_trace_writes_files(tmp_path):
    with profiling.trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert any(f.endswith((".pb", ".json.gz", ".xplane.pb")) for f in found)


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert len(stats) == jax.device_count()
