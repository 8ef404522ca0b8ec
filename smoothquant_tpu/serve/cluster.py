"""Multi-host serving tier: request distribution over batcher replicas.

The north-star deployment runs one model replica per host (TP over ICI
inside the host; see parallel/tp_packed) with requests distributed over
hosts across DCN and continuous batching inside each host.  The reference
has nothing above a single process (SURVEY.md §2.9) — this tier is new
capability.

This module is deliberately transport-agnostic: a `HostReplica` wraps any
ContinuousBatcher-compatible engine, and the `ClusterFrontend` routes
requests with least-outstanding-work scheduling and aggregates throughput /
scaling-efficiency metrics.  On a real pod each replica's step() runs on its
own host (the frontend only exchanges token ids — a few bytes per request
per step over DCN); in-container we validate the scheduling, parity and
metric machinery by stepping replicas round-robin in one process while
tracking each replica's device-busy time separately, which is what the
per-host wall clock would be.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

from smoothquant_tpu.serve.batching import ContinuousBatcher, Request


@dataclasses.dataclass
class ReplicaStats:
    steps: int = 0
    busy_s: float = 0.0
    tokens: int = 0
    requests_done: int = 0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / self.busy_s if self.busy_s > 0 else 0.0


class HostReplica:
    """One host's serving engine + its slice of the bookkeeping."""

    def __init__(self, batcher: ContinuousBatcher, host_id: int):
        self.batcher = batcher
        self.host_id = host_id
        self.stats = ReplicaStats()
        self.requests: list[Request] = []
        self.outstanding = 0  # submitted-but-unfinished token budget

    def submit(self, req: Request) -> None:
        self.outstanding += len(req.prompt) + req.max_new_tokens
        self.requests.append(req)
        self.batcher.submit(req)

    def has_work(self) -> bool:
        return bool(self.batcher.queue) or any(
            r is not None for r in self.batcher.slot_req)

    def step(self) -> list[Request]:
        t0 = time.perf_counter()
        finished = self.batcher.step()
        self.stats.busy_s += time.perf_counter() - t0
        self.stats.steps += 1
        self.stats.tokens = sum(len(r.generated) for r in self.requests)
        for req in finished:
            self.stats.requests_done += 1
            self.outstanding -= len(req.prompt) + req.max_new_tokens
        return finished


class ClusterFrontend:
    """Route requests across host replicas; aggregate scaling metrics.

    make_batcher(host_id) -> ContinuousBatcher builds each host's engine
    (letting callers give every replica its own mesh / TP forward / params
    copy).  Routing = least outstanding work, ties to the lowest host id —
    deterministic, so results are reproducible across runs and host counts.
    """

    def __init__(self, make_batcher: Callable[[int], ContinuousBatcher],
                 n_hosts: int):
        self.replicas = [HostReplica(make_batcher(i), i)
                         for i in range(n_hosts)]

    def submit(self, req: Request) -> None:
        tgt = min(self.replicas, key=lambda r: (r.outstanding, r.host_id))
        tgt.submit(req)

    def rebalance(self) -> int:
        """Work stealing at the queue level: move QUEUED (never-admitted)
        requests from loaded replicas to replicas with idle slot capacity
        and nothing queued.  Only prompt ids move (queued requests own no
        KV state), so on a real pod this is a few KB over DCN.  Attacks
        the routing-imbalance loss the scaling sim attributes (submit-time
        least-outstanding-work routing cannot predict decode lengths)."""
        moved = 0
        while True:
            takers = [r for r in self.replicas
                      if not r.batcher.queue
                      and any(s is None for s in r.batcher.slot_req)]
            # givers: queue EXCESS beyond their own free slots (a replica
            # admits up to its free slots next step; donating only the
            # excess cannot ping-pong — a taker holds at most one queued
            # request against >= 1 free slot, so it never re-qualifies)
            givers = sorted(
                (r for r in self.replicas
                 if len(r.batcher.queue)
                 > sum(s is None for s in r.batcher.slot_req)),
                key=lambda r: -len(r.batcher.queue))
            if not takers or not givers:
                return moved
            g, t = givers[0], takers[0]
            req = g.batcher.queue.pop()       # tail: least FIFO disturbance
            g.outstanding -= len(req.prompt) + req.max_new_tokens
            g.requests.remove(req)
            t.submit(req)
            moved += 1

    def step_all(self) -> list[Request]:
        self.rebalance()
        done: list[Request] = []
        for rep in self.replicas:
            if rep.has_work():
                done.extend(rep.step())
        return done

    def run_to_completion(self, max_steps: int = 10_000) -> list[Request]:
        done: list[Request] = []
        for _ in range(max_steps):
            done.extend(self.step_all())
            if not any(rep.has_work() for rep in self.replicas):
                break
        return done

    def stats(self, baseline_tokens_per_s: Optional[float] = None) -> dict:
        """Aggregate metrics.

        cluster_tokens_per_s models hosts stepping concurrently (tokens /
        max per-host busy time — each host owns its own chips).
        scaling_efficiency = cluster_tps / (n_hosts * single-host baseline)
        when a 1-host baseline measurement is supplied.
        """
        per_host = {r.host_id: dataclasses.asdict(r.stats) | {
            "tokens_per_s": r.stats.tokens_per_s} for r in self.replicas}
        total_tokens = sum(r.stats.tokens for r in self.replicas)
        bottleneck = max((r.stats.busy_s for r in self.replicas), default=0.0)
        cluster_tps = total_tokens / bottleneck if bottleneck > 0 else 0.0
        out = {
            "n_hosts": len(self.replicas),
            "total_tokens": total_tokens,
            "requests_done": sum(r.stats.requests_done for r in self.replicas),
            "cluster_tokens_per_s": cluster_tps,
            "per_host": per_host,
        }
        if baseline_tokens_per_s:
            out["scaling_efficiency"] = cluster_tps / (
                len(self.replicas) * baseline_tokens_per_s)
        return out
