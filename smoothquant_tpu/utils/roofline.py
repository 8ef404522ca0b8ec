"""Roofline accounting + profiling helpers.

The reference has no tracing/profiling at all (SURVEY.md §5); the north star
requires every hot kernel to be roofline-verified.  This module provides:
  * chip peak tables (v5e/v5p/v4),
  * analytic bytes/flops models for the framework's kernels,
  * measure() — timed run (tunnel-safe, via benchtools) reported as a
    fraction of the roofline bound,
  * trace() — a jax.profiler context for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Callable


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_flops: float      # FLOP/s
    int8_ops: float        # OP/s
    hbm_bw: float          # bytes/s


CHIPS = {
    "v5e": ChipSpec("v5e", 197e12, 394e12, 819e9),
    "v5p": ChipSpec("v5p", 459e12, 918e12, 2765e9),
    "v4": ChipSpec("v4", 275e12, 275e12, 1228e9),
}


def detect_chip() -> ChipSpec:
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return CHIPS.get(gen, CHIPS["v5e"])


@dataclasses.dataclass
class KernelCost:
    flops: float
    bytes: float
    int_ops: float = 0.0

    def bound_seconds(self, chip: ChipSpec) -> float:
        """Speed-of-light time: max of compute and memory bounds."""
        t_mem = self.bytes / chip.hbm_bw
        t_flop = self.flops / chip.bf16_flops
        t_int = self.int_ops / chip.int8_ops
        return max(t_mem, t_flop, t_int)


def dual_path_matmul_cost(n, o, k_ns, k_s, group_size, act_bytes=2) -> KernelCost:
    return KernelCost(
        flops=2.0 * n * o * (k_ns + k_s),
        bytes=(n * (k_ns + k_s) * act_bytes + o * k_ns
               + o * (k_ns // group_size) * 4 + o * k_s * 2 + n * o * act_bytes),
    )


def int_group_matmul_cost(n, o, k, k_s, group_size) -> KernelCost:
    g = k // group_size
    return KernelCost(
        flops=2.0 * n * o * k_s + 2.0 * n * o * g,  # salient dot + scaling
        int_ops=2.0 * n * o * k,
        bytes=(n * k + k * o + (n + o) * g * 4 + (n + o) * k_s * 2 + n * o * 2),
    )


def int8_linear_cost(n, o, k) -> KernelCost:
    return KernelCost(flops=n * o * 2.0, int_ops=2.0 * n * o * k,
                      bytes=n * k + o * k + n * o)


@dataclasses.dataclass
class RooflineResult:
    measured_s: float
    bound_s: float
    chip: str

    @property
    def efficiency(self) -> float:
        """Fraction of speed-of-light (1.0 = at the roofline)."""
        return self.bound_s / self.measured_s if self.measured_s else 0.0


def measure(fn: Callable, args, cost: KernelCost, iters: int = 32,
            chip: ChipSpec | None = None) -> RooflineResult:
    from smoothquant_tpu.utils.benchtools import time_steps

    chip = chip or detect_chip()
    t = time_steps(fn, args, iters=iters)
    return RooflineResult(measured_s=t, bound_s=cost.bound_seconds(chip),
                          chip=chip.name)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context — inspect with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
