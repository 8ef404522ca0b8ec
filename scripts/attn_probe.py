"""Standalone decode-attention kernel timing at bench shapes.

Compares the int8-cache kernel (16.8 MB/layer read + in-kernel dequant)
against the bf16-cache kernel (33.5 MB/layer, no converts) to determine
whether the int8 path is DMA- or convert/compute-bound.
"""

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

    from smoothquant_tpu.kernels.decode_attention import (
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

    kf = jnp.asarray(rng.normal(size=(L, B, H, S, D)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(L, B, H, S, D)), jnp.bfloat16)

    def step_i8(q_, k, v, b_, ks_, vs_):
        return decode_attention_stacked(idx, q_, k, v, b_, ks_, vs_,
                                        int8_dots=True)

    def step_i8_bf16dots(q_, k, v, b_, ks_, vs_):
        return decode_attention_stacked(idx, q_, k, v, b_, ks_, vs_,
                                        int8_dots=False)

    def step_fp(q_, k, v, b_):
        return decode_attention_stacked(idx, q_, k, v, b_)

    t8 = time_steps(step_i8, (q, k8, v8, bias, ks, vs), iters=64, repeats=5)
    t8b = time_steps(step_i8_bf16dots, (q, k8, v8, bias, ks, vs),
                     iters=64, repeats=5)
    tf = time_steps(step_fp, (q, kf, vf, bias), iters=64, repeats=5)
    bw8 = 2 * B * H * S * D / t8
    bw8b = 2 * B * H * S * D / t8b
    bwf = 2 * 2 * B * H * S * D / tf
    print(f"int8 cache, int8 MXU dots: {t8*1e6:.1f} us  "
          f"({bw8/1e9:.0f} GB/s of kv bytes)")
    print(f"int8 cache, bf16 dots:     {t8b*1e6:.1f} us  "
          f"({bw8b/1e9:.0f} GB/s of kv bytes)")
    print(f"bf16 cache: {tf*1e6:.1f} us  ({bwf/1e9:.0f} GB/s of kv bytes)")


if __name__ == "__main__":
    main()
