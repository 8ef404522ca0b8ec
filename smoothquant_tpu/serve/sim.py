"""Discrete-event scaling simulation for the cluster serving tier.

Real multi-host hardware does not exist in this container, so the
north-star scaling-efficiency claim is validated in SIMULATION: the real
`ClusterFrontend` routing (least outstanding work) and the real
`ContinuousBatcher` admission policy (bucket-grouped, pow2-row prefill
batches) run unchanged, but each replica's engine is a `SimBatcher` whose
decode/prefill charge a measured COST MODEL to a virtual per-host clock
instead of touching a device.  Feed it per-step costs measured on the real
chip (bench.py does) and a skewed arrival trace; it returns tokens,
makespan, and scaling efficiency vs a single host.

This is labeled simulation, not measurement: it validates scheduling
quality (imbalance, admission batching, routing) under the measured
per-host costs, not DCN transport.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from smoothquant_tpu.serve.batching import ContinuousBatcher, Request
from smoothquant_tpu.serve.cluster import ClusterFrontend


@dataclasses.dataclass
class CostModel:
    """Virtual per-host step costs, in seconds (measure on the real chip)."""

    decode_step_s: float                 # one batched decode step
    prefill_s_per_token: float           # per (padded) prompt token row
    prefill_base_s: float = 0.0          # per prefill launch


@dataclasses.dataclass
class Arrival:
    t: float
    request: Request


class SimBatcher(ContinuousBatcher):
    """ContinuousBatcher with the device replaced by a virtual clock.

    Inherits _admit / _emit / submit / queue semantics untouched — the
    scheduling behavior under test is the real code path — and overrides
    only the jitted device calls (stubs) and step() (charges
    cost.decode_step_s instead of decoding).
    """

    def __init__(self, cost: CostModel, max_batch: int = 4,
                 max_len: int = 512):
        # NOTE: deliberately does NOT call super().__init__ — no model, no
        # jit, no real caches.  Only the state _admit/_emit/step touch.
        self.cost = cost
        self.max_batch, self.max_len = max_batch, max_len
        self.clock = 0.0
        self.key_valid = np.zeros((max_batch, max_len), bool)
        self.seq_pos = np.zeros(max_batch, np.int32)
        self.pool_pos = np.zeros(max_batch, np.int64)
        self.slot_req: list[Optional[Request]] = [None] * max_batch
        self.queue: list[Request] = []
        self._steps = 0
        self.prefill_params = None
        self.params = None
        # loss-attribution counters: slot occupancy measures admission
        # batching quality (empty slots during decode steps)
        self._active_slot_steps = 0
        self._slot_steps = 0

        class _Caches:
            pos = np.zeros(max_batch, np.int64)

        self.caches = [_Caches()]

        def _prefill(params, ids, lens):
            rows, bucket = ids.shape
            self.clock += (cost.prefill_base_s
                           + cost.prefill_s_per_token * rows * bucket)
            # greedy token 0 for every row; content is irrelevant (no EOS
            # in sim traces, max_new_tokens terminates)
            return np.zeros((rows,), np.int32), None

        def _scatter(caches, kv_batch, row, slot, new_pos):
            return caches

        self._prefill, self._scatter = _prefill, _scatter

    def step(self) -> list[Request]:
        self._admit()
        active = [s for s in range(self.max_batch)
                  if self.slot_req[s] is not None]
        if not active:
            return []
        self.clock += self.cost.decode_step_s
        self._steps += 1
        self._active_slot_steps += len(active)
        self._slot_steps += self.max_batch
        finished = []
        for s in active:
            self.seq_pos[s] += 1
            req = self.slot_req[s]
            self._emit(s, 0)
            if req.done:
                finished.append(req)
        return finished


def skewed_trace(n_requests: int, seed: int = 0, *, max_len: int = 512,
                 mean_arrival_s: float = 0.005) -> list[Arrival]:
    """Bursty arrivals (exponential gaps) with long-tailed prompt/output
    lengths — the load-skew case the round-robin tier must absorb."""
    rng = np.random.default_rng(seed)
    t = 0.0
    out = []
    for i in range(n_requests):
        t += float(rng.exponential(mean_arrival_s))
        p_len = int(np.clip(rng.lognormal(3.5, 1.0), 4, max_len // 2))
        m_new = int(np.clip(rng.lognormal(3.0, 0.8), 4, max_len // 2))
        m_new = min(m_new, max_len - p_len)
        prompt = rng.integers(1, 100, size=(p_len,)).astype(np.int32)
        out.append(Arrival(t, Request(uid=i, prompt=prompt,
                                      max_new_tokens=m_new)))
    return out


def uniform_trace(n_requests: int, seed: int = 0, *, max_len: int = 512,
                  gap_s: float = 0.005) -> list[Arrival]:
    """Constant arrival gaps, narrow length spread — the easy case; a
    scheduler below ~1.0 here is losing to its own admission policy, not to
    load skew."""
    rng = np.random.default_rng(seed)
    out = []
    lo_p, hi_p = max(4, max_len // 8), max(6, max_len // 4)
    lo_m, hi_m = max(2, max_len // 16), max(4, max_len // 8)
    for i in range(n_requests):
        p_len = int(rng.integers(lo_p, hi_p))
        m_new = min(int(rng.integers(lo_m, hi_m)), max_len - p_len)
        prompt = rng.integers(1, 100, size=(p_len,)).astype(np.int32)
        out.append(Arrival(gap_s * (i + 1),
                           Request(uid=i, prompt=prompt,
                                   max_new_tokens=m_new)))
    return out


def bursty_trace(n_requests: int, seed: int = 0, *, max_len: int = 512,
                 burst: int = 8, gap_s: float = 0.08) -> list[Arrival]:
    """On/off bursts: `burst` simultaneous arrivals separated by idle gaps
    — stresses routing (a whole burst must spread across hosts) and
    admission batching (bucket grouping inside a burst)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_requests):
        t = gap_s * (i // burst + 1)
        p_len = int(np.clip(rng.lognormal(3.8, 0.7), 8, max_len // 2))
        m_new = int(np.clip(rng.lognormal(3.2, 0.6), 8, max_len // 2))
        m_new = min(m_new, max_len - p_len)
        prompt = rng.integers(1, 100, size=(p_len,)).astype(np.int32)
        out.append(Arrival(t, Request(uid=i, prompt=prompt,
                                      max_new_tokens=m_new)))
    return out


def simulate_cluster(n_hosts: int, trace: list[Arrival], cost: CostModel,
                     *, max_batch: int = 4, max_len: int = 512) -> dict:
    """Event-driven run: always advance the earliest event (lagging working
    replica steps once, or the next arrival is delivered)."""
    front = ClusterFrontend(
        lambda i: SimBatcher(cost, max_batch=max_batch, max_len=max_len),
        n_hosts)
    pending = sorted(trace, key=lambda a: a.t)
    requests = [a.request for a in pending]

    def steal():
        # ClusterFrontend.rebalance with virtual-clock causality: stolen
        # work cannot start before it arrived
        while True:
            takers = [r for r in front.replicas
                      if not r.batcher.queue
                      and any(s is None for s in r.batcher.slot_req)]
            givers = sorted(
                (r for r in front.replicas
                 if len(r.batcher.queue)
                 > sum(s is None for s in r.batcher.slot_req)),
                key=lambda r: -len(r.batcher.queue))
            if not takers or not givers:
                return
            g, t = givers[0], takers[0]
            req = g.batcher.queue.pop()
            g.outstanding -= len(req.prompt) + req.max_new_tokens
            g.requests.remove(req)
            t.batcher.clock = max(t.batcher.clock,
                                  getattr(req, "_arrival_t",
                                          t.batcher.clock))
            t.submit(req)

    while pending or any(rep.has_work() for rep in front.replicas):
        steal()
        workers = [r for r in front.replicas if r.has_work()]
        t_step = min((r.batcher.clock for r in workers), default=float("inf"))
        if pending and pending[0].t <= t_step:
            arr = pending.pop(0)
            # an idle replica cannot have done anything before this arrival
            for rep in front.replicas:
                if not rep.has_work():
                    rep.batcher.clock = max(rep.batcher.clock, arr.t)
            arr.request._arrival_t = arr.t
            front.submit(arr.request)
            continue
        rep = min(workers, key=lambda r: r.batcher.clock)
        rep.step()

    makespan = max(rep.batcher.clock for rep in front.replicas)
    tokens = sum(len(r.generated) for r in requests)
    assert all(r.done for r in requests)
    busy = [rep.batcher.clock for rep in front.replicas]
    occ = [rep.batcher._active_slot_steps / max(rep.batcher._slot_steps, 1)
           for rep in front.replicas]
    return {
        "n_hosts": n_hosts,
        "tokens": tokens,
        "makespan_s": makespan,
        "tokens_per_s": tokens / makespan if makespan else 0.0,
        "per_host_busy_s": busy,
        # loss attribution: routing imbalance = fraction of the makespan the
        # AVERAGE host sits idle behind the slowest; admission occupancy =
        # filled-slot fraction during decode steps (batching quality)
        "routing_imbalance": 1.0 - (sum(busy) / len(busy)) / max(busy)
        if max(busy) else 0.0,
        "admission_occupancy": sum(occ) / len(occ),
    }


def scaling_efficiency(trace: list[Arrival], cost: CostModel, n_hosts: int,
                       **kw) -> dict:
    """tokens/s at n_hosts vs n_hosts × the 1-host run on the SAME trace."""
    one = simulate_cluster(1, _clone_trace(trace), cost, **kw)
    many = simulate_cluster(n_hosts, _clone_trace(trace), cost, **kw)
    eff = many["tokens_per_s"] / (n_hosts * one["tokens_per_s"])
    return {"one_host": one, "n_host": many, "n_hosts": n_hosts,
            "scaling_efficiency": eff,
            "routing_imbalance": many["routing_imbalance"],
            "admission_occupancy": many["admission_occupancy"]}


def _clone_trace(trace: list[Arrival]) -> list[Arrival]:
    return [Arrival(a.t, Request(uid=a.request.uid,
                                 prompt=np.array(a.request.prompt),
                                 max_new_tokens=a.request.max_new_tokens))
            for a in trace]
