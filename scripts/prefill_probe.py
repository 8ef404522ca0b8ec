"""Prefill int8 path timing at the canonical shape (1024, 4096->11008):
bf16 dot vs raw XLA int8 dot vs the fused Pallas epilogue kernel vs the
full promoted-path forward (quantize prologue included)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.int8_prefill import int8_prefill_matmul
    from smoothquant_tpu.kernels.pack import pack_linear, promote_int8
    from smoothquant_tpu.kernels.real_linear import real_quant_linear
    from smoothquant_tpu.quant import w4a4_group
    from smoothquant_tpu.utils.benchtools import time_steps

    N, K, O = 1024, 4096, 11008
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, K)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(O, K)) * 0.02, jnp.bfloat16)

    qcfg = w4a4_group(group_size=64, salient_prop=0.05)
    pk = promote_int8(pack_linear(
        {"weight": w, "bias": None}, qcfg,
        importance=rng.uniform(0.1, 1.0, size=(K,)), nibble=True,
        compute_dtype=jnp.bfloat16))

    x_q = jnp.asarray(rng.integers(-127, 128, size=(N, K)), jnp.int8)
    sx = jnp.asarray(rng.uniform(0.001, 0.01, size=(N, 1)), jnp.float32)
    sw = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)
    k_s = pk.w_sal_t.shape[0]
    x_sal = jnp.asarray(rng.normal(size=(N, k_s)), jnp.bfloat16)

    def bf16_dot(x_, wt):
        return jnp.dot(x_, wt, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def raw_int8(xq, wq):
        return jax.lax.dot_general(
            xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def fused(xq, sx_, wq, sw_, xs, ws):
        return int8_prefill_matmul(xq, sx_, wq, sw_, xs, ws,
                                   out_dtype=jnp.bfloat16)

    mask = jnp.ones((1, K), jnp.float32)

    def fused_rawx(x_, sx_, wq, sw_, xs, ws, m):
        return int8_prefill_matmul(x_, sx_, wq, sw_,
                                   xs, ws, m, out_dtype=jnp.bfloat16)

    def full_fwd(x_, p):
        return real_quant_linear(p, x_, compute="int")

    n_sal = pk.meta.num_salient
    sal_idx = pk.perm[K - n_sal:]
    ns_f = jnp.ones((K,), jnp.float32).at[sal_idx].set(0.0)

    def full_fwd_xla(x_, wq, sw_, ws):
        # the round-2 pure-XLA composition: dot -> int32 acc in HBM ->
        # scale epilogue pass -> salient dot+add pass
        xf = x_.astype(jnp.float32) * ns_f[None, :]
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx_ = jnp.maximum(absmax, 1e-5) / 127.0
        xq = jnp.round(xf / sx_).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx_ * sw_
        xs = jnp.take(x_, sal_idx, axis=-1).astype(ws.dtype)
        y = y + jax.lax.dot_general(
            xs, ws[:n_sal], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    t_bf = time_steps(bf16_dot, (x, w.T), iters=16, repeats=5)
    t_raw = time_steps(raw_int8, (x_q, pk.w_qt), iters=16, repeats=5)
    t_k = time_steps(fused, (x_q, sx, pk.w_qt, sw, x_sal,
                             pk.w_sal_t.astype(jnp.bfloat16)),
                     iters=16, repeats=5)
    t_kr = time_steps(fused_rawx, (x, sx, pk.w_qt, sw, x_sal,
                                   pk.w_sal_t.astype(jnp.bfloat16), mask),
                      iters=16, repeats=5)
    t_full = time_steps(full_fwd, (x, pk), iters=16, repeats=5)
    t_xla = time_steps(full_fwd_xla, (x, pk.w_qt, sw,
                                      pk.w_sal_t.astype(jnp.bfloat16)),
                       iters=16, repeats=5)
    print(f"bf16 dot:                 {t_bf*1e3:.3f} ms")
    print(f"raw int8 dot (no epilog): {t_raw*1e3:.3f} ms")
    print(f"fused Pallas kernel:      {t_k*1e3:.3f} ms "
          f"({t_bf/t_k:.2f}x bf16)")
    print(f"fused kernel, raw-x:      {t_kr*1e3:.3f} ms "
          f"({t_bf/t_kr:.2f}x bf16)")
    print(f"full promoted forward:    {t_full*1e3:.3f} ms "
          f"({t_bf/t_full:.2f}x bf16)")
    print(f"old pure-XLA composition: {t_xla*1e3:.3f} ms "
          f"({t_bf/t_xla:.2f}x bf16)")


if __name__ == "__main__":
    main()
