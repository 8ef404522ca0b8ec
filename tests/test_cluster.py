"""Multi-host serving tier: routing, parity with single-host, metrics."""

import numpy as np
import pytest
import jax

from smoothquant_tpu.models import llama as jllama
from smoothquant_tpu.serve import ClusterFrontend, ContinuousBatcher, Request


@pytest.fixture(scope="module")
def tiny_llama():
    cfg = jllama.LlamaConfig.tiny()
    params = jllama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _reqs(cfg, n=6):
    rng = np.random.default_rng(7)
    return [Request(uid=i,
                    prompt=rng.integers(0, cfg.vocab_size, size=(int(ln),)),
                    max_new_tokens=4)
            for i, ln in enumerate(rng.integers(3, 12, size=n))]


def test_cluster_matches_single_host_tokens(tiny_llama):
    """Greedy decode is deterministic — every request must produce the same
    tokens whether served by 1 host or distributed over 2."""
    cfg, params = tiny_llama

    def make(host_id):
        return ContinuousBatcher(jllama, params, cfg, max_batch=2, max_len=64)

    single = ClusterFrontend(make, n_hosts=1)
    for r in _reqs(cfg):
        single.submit(r)
    done1 = {r.uid: list(r.generated) for r in single.run_to_completion()}

    duo = ClusterFrontend(make, n_hosts=2)
    for r in _reqs(cfg):
        duo.submit(r)
    done2 = {r.uid: list(r.generated) for r in duo.run_to_completion()}

    assert set(done1) == set(done2) == set(range(6))
    for uid in done1:
        assert done1[uid] == done2[uid], uid


def test_cluster_routing_balances(tiny_llama):
    cfg, params = tiny_llama

    def make(host_id):
        return ContinuousBatcher(jllama, params, cfg, max_batch=2, max_len=64)

    duo = ClusterFrontend(make, n_hosts=2)
    for r in _reqs(cfg, n=8):
        duo.submit(r)
    per_host = [len(rep.requests) for rep in duo.replicas]
    assert sum(per_host) == 8
    assert min(per_host) >= 3  # least-outstanding routing spreads the load


def test_cluster_stats_and_efficiency(tiny_llama):
    cfg, params = tiny_llama

    def make(host_id):
        return ContinuousBatcher(jllama, params, cfg, max_batch=2, max_len=64)

    duo = ClusterFrontend(make, n_hosts=2)
    for r in _reqs(cfg, n=4):
        duo.submit(r)
    duo.run_to_completion()
    stats = duo.stats(baseline_tokens_per_s=1e12)  # force a tiny efficiency
    assert stats["requests_done"] == 4
    assert stats["total_tokens"] == 4 * 4
    assert stats["n_hosts"] == 2
    assert 0.0 <= stats["scaling_efficiency"] < 1.0
    assert set(stats["per_host"]) == {0, 1}
