"""Scaling-efficiency simulation (serve/sim.py): the real frontend routing
and admission policy under a virtual clock + measured cost model."""

import numpy as np

from smoothquant_tpu.serve.batching import Request
from smoothquant_tpu.serve.sim import (
    Arrival,
    CostModel,
    scaling_efficiency,
    simulate_cluster,
    skewed_trace,
)

COST = CostModel(decode_step_s=0.009, prefill_s_per_token=2e-5,
                 prefill_base_s=0.001)


def test_single_request_cannot_scale():
    # one request: a second host is pure idle → efficiency ~0.5
    trace = [Arrival(0.0, Request(uid=0,
                                  prompt=np.arange(16, dtype=np.int32),
                                  max_new_tokens=32))]
    r = scaling_efficiency(trace, COST, 2)
    assert abs(r["scaling_efficiency"] - 0.5) < 1e-6


def test_skewed_trace_efficiency_bounds_and_determinism():
    trace = skewed_trace(48, seed=3)
    r1 = scaling_efficiency(trace, COST, 2)
    r2 = scaling_efficiency(trace, COST, 2)
    assert r1["scaling_efficiency"] == r2["scaling_efficiency"]
    # 48 long-tailed requests over 2x4 slots: real but imperfect scaling
    assert 0.6 < r1["scaling_efficiency"] <= 1.0 + 1e-9, r1["scaling_efficiency"]
    # all tokens generated on both runs
    assert r1["one_host"]["tokens"] == r1["n_host"]["tokens"] > 0


def test_makespan_shrinks_with_hosts():
    trace = skewed_trace(48, seed=5)
    one = simulate_cluster(1, trace, COST)
    # simulate_cluster mutates request state; rebuild trace for the 2-host run
    trace2 = skewed_trace(48, seed=5)
    two = simulate_cluster(2, trace2, COST)
    assert two["makespan_s"] < one["makespan_s"]
