"""Focused follow-up: tile_o/vmem grid for the int8 prefill kernel + bf16
variance check.  Run: nohup python scripts/prefill_fix_probe2.py ..."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"platform={jax.devices()[0].platform}")

    import dataclasses as dc

    from smoothquant_tpu.kernels.pack import pack_linear, promote_int8
    from smoothquant_tpu.kernels.int8_prefill import int8_prefill_matmul
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.quant.core import compute_scale
    from smoothquant_tpu.utils.benchtools import time_steps

    N, K, O = 1024, 4096, 11008
    qcfg = dc.replace(w4a4_group(group_size=64, salient_prop=0.05),
                      scale_dtype="bfloat16")
    rng = np.random.default_rng(0)
    kx = jax.random.PRNGKey(7)
    w = jax.random.normal(kx, (O, K), jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.fold_in(kx, 1), (N, K), jnp.bfloat16)
    pk = promote_int8(pack_linear({"weight": w, "bias": None}, qcfg,
                                  importance=rng.uniform(0.1, 1., size=(K,)),
                                  nibble=True))
    meta = pk.meta

    def bf16(xx, wt):
        return jnp.dot(xx, wt, preferred_element_type=jnp.float32
                       ).astype(xx.dtype)

    for i in range(3):
        t = time_steps(bf16, (x, w.T), iters=64, repeats=7)
        log(f"bf16 run{i}: {t*1e3:.3f} ms")

    c = meta.in_features
    sal_idx = pk.perm[c - meta.num_salient:]
    ns = jnp.ones((c,), jnp.float32).at[sal_idx].set(0.0)
    sw_t = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)

    def prologue(xx):
        xf = xx.astype(jnp.float32) * ns[None, :]
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx = compute_scale(absmax, 8)
        x_q = jnp.round(xf / sx).astype(jnp.int8)
        x_sal = jnp.zeros((xx.shape[0], pk.w_sal_t.shape[0]),
                          pk.w_sal_t.dtype)
        x_sal = x_sal.at[:, : meta.num_salient].set(
            jnp.take(xx, sal_idx, axis=-1).astype(x_sal.dtype))
        return x_q, sx, x_sal

    def xla_full(xx, wq):
        x_q, sx, x_sal = prologue(xx)
        acc = jax.lax.dot_general(
            x_q, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * sw_t
        y = y + jax.lax.dot_general(
            x_sal, pk.w_sal_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    for i in range(2):
        t = time_steps(xla_full, (x, pk.w_qt), iters=64, repeats=7)
        log(f"xla_full run{i}: {t*1e3:.3f} ms")

    for name, kw in [
        ("t1024_256_v100 run0", dict(tile_n=1024, tile_o=256, tile_k=4096)),
        ("t1024_256_v100 run1", dict(tile_n=1024, tile_o=256, tile_k=4096)),
        ("t1024_256_v16", dict(tile_n=1024, tile_o=256, tile_k=4096,
                               vmem_limit_mb=16)),
        ("t1024_128_v100", dict(tile_n=1024, tile_o=128, tile_k=4096)),
        ("t1024_384_v100", dict(tile_n=1024, tile_o=384, tile_k=4096)),
        ("t512_256_v100", dict(tile_n=512, tile_o=256, tile_k=4096)),
    ]:
        def kern(xx, wq, kw=kw):
            x_q, sx, x_sal = prologue(xx)
            return int8_prefill_matmul(x_q, sx, wq, sw_t, x_sal, pk.w_sal_t,
                                       out_dtype=jnp.bfloat16, **kw)

        try:
            t = time_steps(kern, (x, pk.w_qt), iters=64, repeats=7)
            log(f"{name}: {t*1e3:.3f} ms")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
