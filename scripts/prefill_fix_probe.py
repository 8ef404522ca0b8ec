"""TPU A/B for the prefill regression (VERDICT r4 weak #2): why did
prefill_vs_bf16 fall 1.215 -> 1.078, and which path reaches the ~2x bar?

Candidates at (1024, 4096 -> 11008), W8A8 promoted-int8 5% salient:
  bf16      — plain bf16 dot (the baseline)
  raw_int8  — bare XLA int8 dot (upper bound, ~0.22 ms)
  xla_full  — XLA int8 dot + XLA-fused epilogue + salient dot (the
              use_kernel=False branch of _identity_int8_forward)
  kern_100  — fused Pallas kernel, vmem_limit 100 MB (r4 state)
  kern_16   — fused Pallas kernel, vmem_limit 16 MB (r3 state)
  kern_tXXX — tile variants

Run:  PYTHONPATH=/root/repo nohup python scripts/prefill_fix_probe.py \
        > /tmp/prefill_fix.log 2>&1 &
"""

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
    from functools import partial

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
    log(f"meta: num_salient={meta.num_salient} k_s={pk.w_sal_t.shape[0]}")

    def bf16(xx, wt):
        return jnp.dot(xx, wt, preferred_element_type=jnp.float32
                       ).astype(xx.dtype)

    t = time_steps(bf16, (x, w.T), iters=64, repeats=7)
    t_bf = t
    log(f"bf16: {t*1e3:.3f} ms")

    # shared prologue (as _identity_int8_forward builds it)
    c = meta.in_features
    sal_idx = pk.perm[c - meta.num_salient:]
    ns = jnp.ones((c,), jnp.float32).at[sal_idx].set(0.0)

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

    x_q0, sx0, x_sal0 = jax.jit(prologue)(x)
    x_q0 = jax.block_until_ready(x_q0)

    def raw_int8(xx, wq):
        # thread the perturbed float arg into the int operand (DCE guard)
        xq = x_q0 + jnp.round(xx[:1, :1] * 0).astype(jnp.int8)
        return jax.lax.dot_general(
            xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    t = time_steps(raw_int8, (x, pk.w_qt), iters=64, repeats=7)
    log(f"raw_int8 dot: {t*1e3:.3f} ms ({t_bf/t:.2f}x bf16)")

    sw_t = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)

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

    t = time_steps(xla_full, (x, pk.w_qt), iters=64, repeats=7)
    log(f"xla_full (prologue+dot+epi+sal): {t*1e3:.3f} ms "
        f"({t_bf/t:.2f}x bf16)")

    # xla dot+epilogue only, prologue excluded (pre-quantized x)
    def xla_body(xx, wq):
        xq = x_q0 + jnp.round(xx[:1, :1] * 0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx0 * sw_t
        y = y + jax.lax.dot_general(
            x_sal0, pk.w_sal_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    t = time_steps(xla_body, (x, pk.w_qt), iters=64, repeats=7)
    log(f"xla_body (dot+epi+sal, prequant): {t*1e3:.3f} ms "
        f"({t_bf/t:.2f}x bf16)")

    # prologue alone
    def prologue_only(xx):
        x_q, sx, x_sal = prologue(xx)
        return x_q.astype(jnp.float32).sum() + x_sal.sum() + sx.sum()

    t = time_steps(prologue_only, (x,), iters=64, repeats=7)
    log(f"prologue alone: {t*1e3:.3f} ms")

    # fused kernel variants
    for name, kw in [
        ("kern_100", dict()),
        ("kern_16", dict(vmem_limit_mb=16)),
        ("kern_t512_512", dict(tile_n=512, tile_o=512, tile_k=4096)),
        ("kern_t1024_256", dict(tile_n=1024, tile_o=256, tile_k=4096)),
        ("kern_t1024_512_k2048", dict(tile_n=1024, tile_o=512, tile_k=2048)),
        ("kern_t256_512", dict(tile_n=256, tile_o=512, tile_k=4096)),
    ]:
        def kern(xx, wq, kw=kw):
            x_q, sx, x_sal = prologue(xx)
            return int8_prefill_matmul(x_q, sx, wq, sw_t, x_sal, pk.w_sal_t,
                                       out_dtype=jnp.bfloat16, **kw)

        try:
            t = time_steps(kern, (x, pk.w_qt), iters=64, repeats=7)
            log(f"{name}: {t*1e3:.3f} ms ({t_bf/t:.2f}x bf16)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
