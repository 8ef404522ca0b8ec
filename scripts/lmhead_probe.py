"""lm_head identity-int8 path timing at the decode shape (4, 4096->32000):
old pure-XLA composition vs the fused Pallas epilogue kernel
(kernels/int8_prefill.py) that real_quant_linear now routes through."""

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
    from smoothquant_tpu.kernels.pack import pack_linear
    from smoothquant_tpu.kernels.real_linear import real_quant_linear
    from smoothquant_tpu.quant.config import QuantConfig
    from smoothquant_tpu.utils.benchtools import time_steps

    N, K, O = 4, 4096, 32000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, K)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(O, K)) * 0.02, jnp.bfloat16)

    head = QuantConfig(weight_quant="per_channel", act_quant="per_token",
                       quant_bits=8)
    pk = pack_linear({"weight": w, "bias": None}, head)
    assert pk.meta.layout == "identity" and not pk.meta.nibble

    sw = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)

    def full_fwd(x_, p):
        return real_quant_linear(p, x_, out_dtype=jnp.bfloat16)

    def old_xla(x_, wq, sw_):
        xf = x_.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sx_ = jnp.maximum(absmax, 1e-5) / 127.0
        xq = jnp.round(xf / sx_).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx_ * sw_).astype(jnp.bfloat16)

    def bf16_dot(x_, wt):
        return jnp.dot(x_, wt, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    t_new = time_steps(full_fwd, (x, pk), iters=32, repeats=5)
    t_old = time_steps(old_xla, (x, pk.w_qt, sw), iters=32, repeats=5)
    t_bf = time_steps(bf16_dot, (x, w.T), iters=32, repeats=5)
    print(f"fused Pallas kernel path: {t_new*1e3:.3f} ms")
    print(f"old pure-XLA composition: {t_old*1e3:.3f} ms")
    print(f"bf16 dot:                 {t_bf*1e3:.3f} ms")


if __name__ == "__main__":
    main()
