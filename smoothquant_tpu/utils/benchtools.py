"""Honest device timing over the axon TPU tunnel.

Two gotchas make naive timing lie here:
  1. jax.block_until_ready returns before remote execution completes on the
     tunneled backend — only a host fetch (float()/np.asarray) synchronizes.
  2. repeated identical executions can be memoized upstream, so iterations
     must be data-dependent on the previous result.

time_steps() therefore runs K chained iterations inside ONE jitted fori_loop
(so a single ~27 ms tunnel roundtrip covers all K steps) and differences two
iteration counts to cancel the roundtrip + dispatch constant.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_steps(
    step: Callable,
    args,
    iters: int = 8,
    baseline_iters: int = 2,
    warmup: bool = True,
    repeats: int = 1,
    stateful: bool = False,
) -> float:
    """Seconds per call of step(*args).

    step must return an array; its mean is chained into a dummy additive
    perturbation of the first (integer) arg to serialize iterations.
    repeats > 1 re-measures and takes the minimum difference — use with
    large `iters` for sub-0.1 ms kernels where tunnel jitter (~1 ms)
    otherwise swamps the signal.

    stateful=True: step returns (out, new_state) and the LAST positional arg
    is the state, threaded through the timing loop's carry.  This is how a
    real decode loop treats its KV cache — without it XLA must copy every
    state buffer once per step to keep the loop-invariant input intact
    (measured ~0.4 ms/step on a 0.5 GB stacked cache).
    """

    def chained(n_iters):
        @jax.jit
        def run(*a):
            first = a[0]

            def body(i, carry):
                s, state = carry
                # data-dependence on previous step (min(s,0) == 0 numerically)
                bump = jnp.minimum(s, 0.0).astype(first.dtype)
                t = first + bump + (i * 0).astype(first.dtype)
                if stateful:
                    out, new_state = step(t, *a[1:-1], state)
                else:
                    out = step(t, *a[1:])
                    new_state = state
                return jnp.mean(out).astype(jnp.float32), new_state

            init = (jnp.float32(0.0), a[-1] if stateful else 0)
            return jax.lax.fori_loop(0, n_iters, body, init)[0]

        return run

    run_big = chained(iters + baseline_iters)
    run_small = chained(baseline_iters)
    if warmup:
        float(run_big(*args))
        float(run_small(*args))

    first = args[0]
    perturbable = hasattr(first, "dtype") and jnp.issubdtype(
        jnp.asarray(first).dtype, jnp.floating)

    diffs = []
    for r in range(repeats):
        # repeated IDENTICAL executions can be memoized upstream (see module
        # docstring) — vary the first float arg per repeat to defeat that
        a = ((first + jnp.asarray((r + 1) * 1e-6, first.dtype),)
             + tuple(args[1:]) if perturbable else args)
        t0 = time.perf_counter()
        float(run_small(*a))
        t_small = time.perf_counter() - t0

        t0 = time.perf_counter()
        float(run_big(*a))
        t_big = time.perf_counter() - t0
        diffs.append(max(t_big - t_small, 1e-9) / iters)
    # tunnel roundtrip jitter spikes corrupt individual differences in either
    # direction — the median is the robust estimator
    diffs.sort()
    return diffs[len(diffs) // 2]
