"""Smoke coverage for the observability utilities (SURVEY.md section 5:
tracing/profiling + metrics logging, which the reference lacks entirely)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from coskad_tpu.utils.logging import MetricLogger
from coskad_tpu.utils.profiling import (Timer, debug_nans,
                                        device_memory_stats, throughput)


def test_timer_stats():
    t = Timer()
    for _ in range(3):
        with t.measure():
            sum(range(1000))
    s = t.stats()
    assert s["step/count"] == 3.0
    assert s["step/min_s"] <= s["step/p50_s"] <= s["step/max_s"]
    assert Timer().stats() == {}


def test_throughput_measures_items_per_sec():
    f = lambda x: jnp.sum(x * 2)
    rate = throughput(f, jnp.ones(64), items_per_call=64, warmup=1, iters=3)
    assert rate > 0


def test_debug_nans_context_catches_nan():
    with pytest.raises(FloatingPointError):
        with debug_nans():
            jnp.log(jnp.zeros(2) - 1.0).block_until_ready()
    # config restored: NaNs pass silently again outside the context
    assert bool(jnp.isnan(jnp.log(-1.0)))


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_metric_logger_jsonl_and_gating(tmp_path):
    logger = MetricLogger(log_dir=str(tmp_path), every_n_steps=10)
    logger.log({"loss": 1.0}, step=3)            # off-grid: dropped
    logger.log({"loss": 0.5}, step=10)           # on-grid: written
    logger.log({"auc": 0.9}, step=11, force=True)  # forced: written
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(rows) == 2
    assert rows[0]["loss"] == 0.5 and rows[1]["auc"] == 0.9
