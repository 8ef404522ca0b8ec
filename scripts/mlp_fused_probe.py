"""On-chip probe: fused SwiGLU-MLP megakernel vs the two-launch rawx
composition at the flagship decode shapes (llama2-7B dims, W4A4 g64 5%
salient, N=4).  Also spot-checks numerics vs the composition on-chip."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 4
GS = 64
L = 4
C = 4096
INTER = 11008
O1P = 22528          # 2*11008 aligned to 2048
KK2 = 11264          # 11008 aligned to 1024 (2*gs*align8)
O2 = 4096
KS1, KS2 = 256, 576
NSAL1, NSAL2 = 204, 550


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.int4_group_matmul import (
        int4_group_matmul_stacked_rawx,
    )
    from smoothquant_tpu.kernels.mlp_fused import mlp_swiglu_fused_stacked
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    g1, g2 = C // GS, KK2 // GS
    gu_wp = jnp.asarray(rng.integers(-128, 128, size=(L, C // 2, O1P),
                                     dtype=np.int8))
    gu_ws = jnp.asarray(rng.uniform(0.005, 0.01, size=(L, g1, O1P))
                        .astype(np.float32), jnp.bfloat16)
    gu_sal = jnp.asarray(rng.normal(size=(L, KS1, O1P)).astype(np.float32)
                         * 0.02, jnp.bfloat16)
    dn_wp = jnp.asarray(rng.integers(-128, 128, size=(L, KK2 // 2, O2),
                                     dtype=np.int8))
    dn_ws = jnp.asarray(rng.uniform(0.005, 0.01, size=(L, g2, O2))
                        .astype(np.float32), jnp.bfloat16)
    dn_sal = jnp.asarray(rng.normal(size=(L, KS2, O2)).astype(np.float32)
                         * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.8, 1.2, size=(C,)).astype(np.float32),
                     jnp.bfloat16)
    idx = jnp.asarray([1], jnp.int32)

    # weights ride as ARGUMENTS, never closure constants (closing over
    # them inlines GBs into the module — the tunnel rejects it at HTTP 413)
    w_args = (nw, gu_wp, gu_ws, gu_sal, dn_wp, dn_ws, dn_sal)

    def fused(idx_, x_, nw_, gu_wp_, gu_ws_, gu_sal_, dn_wp_, dn_ws_,
              dn_sal_):
        return mlp_swiglu_fused_stacked(
            idx_, x_, nw_, gu_wp_, gu_ws_, gu_sal_, dn_wp_, dn_ws_, dn_sal_,
            group_size=GS, act_bits=4, n_sal1=NSAL1, n_sal2=NSAL2,
            gu_out_true=2 * INTER, dn_out_true=O2, eps=1e-5,
            out_dtype=jnp.bfloat16)

    def two_launch(idx_, x_, nw_, gu_wp_, gu_ws_, gu_sal_, dn_wp_, dn_ws_,
                   dn_sal_):
        y = int4_group_matmul_stacked_rawx(
            idx_, x_, nw_, gu_wp_, gu_ws_, gu_sal_, group_size=GS, act_bits=4,
            num_salient=NSAL1, eps=1e-5, out_dtype=jnp.float32)[:, :2 * INTER]
        h = (jax.nn.silu(y[:, :INTER]) * y[:, INTER:]).astype(jnp.bfloat16)
        return int4_group_matmul_stacked_rawx(
            idx_, h, None, dn_wp_, dn_ws_, dn_sal_, group_size=GS, act_bits=4,
            num_salient=NSAL2, out_dtype=jnp.bfloat16)[:, :O2]

    # numerics spot-check (bf16 intermediate in two_launch vs f32 in fused:
    # expect close, not exact)
    a = np.asarray(jax.jit(fused)(idx, x, *w_args), np.float32)
    b = np.asarray(jax.jit(two_launch)(idx, x, *w_args), np.float32)
    err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
    print(json.dumps({"check_rel_err": float(err)}), flush=True)

    t_fused = time_steps(fused, (idx, x) + w_args, iters=64, repeats=5)
    t_two = time_steps(two_launch, (idx, x) + w_args, iters=64, repeats=5)
    wbytes = (gu_wp.nbytes + gu_ws.nbytes + gu_sal.nbytes
              + dn_wp.nbytes + dn_ws.nbytes + dn_sal.nbytes) / L
    print(json.dumps({
        "fused_us": round(t_fused * 1e6, 1),
        "two_launch_us": round(t_two * 1e6, 1),
        "speedup": round(t_two / t_fused, 3),
        "fused_gbps": round(wbytes / t_fused / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
