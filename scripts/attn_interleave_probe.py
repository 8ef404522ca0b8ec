"""Does merging K and V into ONE interleaved cache array (one 4 MB DMA per
grid step instead of two 2 MB DMAs) move the DMA-issue-bound decode
attention kernel closer to its bandwidth floor?

Layout under test: kv_q (L, B, 2*H_kv, S, D) int8 with head 2j = K_j and
head 2j+1 = V_j; scales (L, B, 2*H_kv, S).  Same flash math, same grid.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.decode_attention import (
        _flash_head,
        decode_attention_stacked,
    )
    from smoothquant_tpu.utils.benchtools import time_steps

    L, B, H, S, D = 8, 4, 32, 512, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    bias = jnp.zeros((B, S), jnp.float32)
    idx = jnp.asarray([3], jnp.int32)

    k8 = jnp.asarray(rng.integers(-127, 127, size=(L, B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 127, size=(L, B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.02, size=(L, B, H, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.02, size=(L, B, H, S)), jnp.float32)

    # interleaved: (L, B, 2H, S, D), head 2j = K_j, 2j+1 = V_j
    kv8 = jnp.stack([k8, v8], axis=3).reshape(L, B, 2 * H, S, D)
    kvs = jnp.stack([ks, vs], axis=3).reshape(L, B, 2 * H, S)

    sm_scale = 1.0 / (D ** 0.5)

    def make_interleaved(hc: int, bc: int, ts: int):
        n_kv = H

        def kernel(idx_ref, q_ref, kv_ref, bias_ref, sc_ref,
                   o_ref, m_ref, l_ref, acc_ref):
            del idx_ref
            st = pl.program_id(2)
            n_st = pl.num_programs(2)
            for b2 in range(bc):
                for j in range(hc):
                    _flash_head(
                        q_ref[b2, j],
                        kv_ref[0, b2, 2 * j].astype(jnp.bfloat16),
                        kv_ref[0, b2, 2 * j + 1].astype(jnp.bfloat16),
                        bias_ref[b2, 0],
                        sc_ref[0, b2, 2 * j:2 * j + 1],
                        sc_ref[0, b2, 2 * j + 1:2 * j + 2],
                        sm_scale, m_ref, l_ref, acc_ref,
                        (b2 * hc + j) * 8,
                        st == 0, st == n_st - 1, o_ref, j, o_b=b2,
                    )

        grid = (B // bc, n_kv // hc, S // ts)
        q4 = q.reshape(B, n_kv, 1, D)
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, 7), (0, 0)))
        bias4 = bias.reshape(B, S // ts, 1, ts)

        @jax.jit
        def run(q4_, kv_, bias4_, sc_):
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=grid,
                    in_specs=[
                        pl.BlockSpec((bc, hc, 8, D),
                                     lambda bb, hh, st, i: (bb, hh, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, bc, 2 * hc, ts, D),
                                     lambda bb, hh, st, i:
                                     (i[0], bb, hh, st, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((bc, 1, 1, ts),
                                     lambda bb, hh, st, i: (bb, st, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, bc, 2 * hc, ts),
                                     lambda bb, hh, st, i:
                                     (i[0], bb, hh, st),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((bc, hc, 8, D),
                                           lambda bb, hh, st, i:
                                           (bb, hh, 0, 0),
                                           memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((bc * hc * 8, 128), jnp.float32),
                        pltpu.VMEM((bc * hc * 8, 128), jnp.float32),
                        pltpu.VMEM((bc * hc * 8, D), jnp.float32),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((B, n_kv, 8, D), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary"),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=4 * B * H * S * D,
                    bytes_accessed=2 * B * H * S * D + B * H * D * 4,
                    transcendentals=B * H * S,
                ),
            )(idx, q4_, kv_, bias4_, sc_)
            return out[:, :, :1].reshape(B, H, D)

        return run, (q4, kv8, bias4, kvs)

    def step_base(q_, k, v, b_, ks_, vs_):
        return decode_attention_stacked(idx, q_, k, v, b_, ks_, vs_)

    t0 = time_steps(step_base, (q, k8, v8, bias, ks, vs), iters=64,
                    repeats=5)
    print(f"separate K/V (current): {t0*1e6:.1f} us", flush=True)
    for hc, bc, ts in [(8, 2, 512), (8, 4, 512), (16, 2, 512), (16, 1, 512),
                       (4, 4, 512)]:
        try:
            fn, args = make_interleaved(hc, bc, ts)
            t = time_steps(fn, args, iters=64, repeats=3)
            mb = bc * 2 * hc * ts * D / 1e6
            print(f"interleaved hc={hc} bc={bc} ({mb:.0f} MB/step): "
                  f"{t*1e6:.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"interleaved hc={hc} bc={bc}: FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
