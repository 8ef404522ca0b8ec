"""Fused attention-chain kernel vs the unfused composition, inside a
lax.scan at bench shapes (llama2-7B dims, B=4, int8 cache).  Measures the
per-layer saving from collapsing k-rotary + KV quantize + cache write +
bias + flash attention into one Pallas call."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L, B, H, NKV, S, D = 32, 4, 32, 32, 512, 128


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from smoothquant_tpu.kernels.attn_fused import (
        fused_rope_write_attn_stacked,
    )
    from smoothquant_tpu.kernels.cache_write import write_quant_cache_stacked
    from smoothquant_tpu.kernels.decode_attention import (
        decode_attention_stacked,
    )
    from smoothquant_tpu.models.common import apply_rotary, decode_bias
    from smoothquant_tpu.utils.benchtools import time_steps

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    kv0 = jnp.asarray(rng.normal(size=(B, NKV, D)), jnp.bfloat16)
    cos = jnp.asarray(rng.uniform(-1, 1, size=(B, 1, D)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, size=(B, 1, D)), jnp.float32)
    k_q = jnp.asarray(rng.integers(-127, 128, size=(L, B, NKV, S, D),
                                   dtype=np.int8))
    v_q = jnp.asarray(rng.integers(-127, 128, size=(L, B, NKV, S, D),
                                   dtype=np.int8))
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(L, B, NKV, S)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(L, B, NKV, S)),
                     jnp.float32)
    pos = jnp.asarray(S - 64, jnp.int32)

    def scan_unfused(q0_, kv0_, kq, vq, kss, vss):
        def body(carry, i):
            x, kq, vq, kss, vss = carry
            qr = apply_rotary(q0_ + x[:, None, None, :D].astype(q0_.dtype)
                              * 0.01, cos, sin)[:, 0]
            kq, vq, kss, vss = write_quant_cache_stacked(
                i, pos, kv0_, kv0_, cos, sin, kq, vq, kss, vss)
            bias = decode_bias(pos, B, S, None)
            a = decode_attention_stacked(
                jnp.asarray(i, jnp.int32).reshape(1), qr, kq, vq, bias,
                kss, vss)
            return (x + a.reshape(B, -1)[:, :D].astype(x.dtype) * 0.01,
                    kq, vq, kss, vss), None

        (x, *_), _ = jax.lax.scan(
            body, (jnp.zeros((B, D), jnp.float32), kq, vq, kss, vss),
            jnp.arange(L))
        return x

    def scan_fused(q0_, kv0_, kq, vq, kss, vss):
        def body(carry, i):
            x, kq, vq, kss, vss = carry
            qr = apply_rotary(q0_ + x[:, None, None, :D].astype(q0_.dtype)
                              * 0.01, cos, sin)[:, 0]
            a, kq, vq, kss, vss = fused_rope_write_attn_stacked(
                i, pos, qr, kv0_, kv0_, cos, sin, kq, vq, kss, vss)
            return (x + a.reshape(B, -1)[:, :D].astype(x.dtype) * 0.01,
                    kq, vq, kss, vss), None

        (x, *_), _ = jax.lax.scan(
            body, (jnp.zeros((B, D), jnp.float32), kq, vq, kss, vss),
            jnp.arange(L))
        return x

    from smoothquant_tpu.kernels.attn_fused import fused_virtual_attn_stacked

    def scan_virtual(q0_, kv0_, kq, vq, kss, vss):
        def body(carry, i):
            x, kq, vq, kss, vss = carry
            qr = apply_rotary(q0_ + x[:, None, None, :D].astype(q0_.dtype)
                              * 0.01, cos, sin)[:, 0]
            a = fused_virtual_attn_stacked(
                i, pos, qr, kv0_, kv0_, cos, sin, kq, vq, kss, vss)
            kq, vq, kss, vss = write_quant_cache_stacked(
                i, pos, kv0_, kv0_, cos, sin, kq, vq, kss, vss)
            return (x + a.reshape(B, -1)[:, :D].astype(x.dtype) * 0.01,
                    kq, vq, kss, vss), None

        (x, *_), _ = jax.lax.scan(
            body, (jnp.zeros((B, D), jnp.float32), kq, vq, kss, vss),
            jnp.arange(L))
        return x

    args = (q0, kv0, k_q, v_q, ks, vs)
    t_u = time_steps(scan_unfused, args, iters=16, repeats=5)
    t_f = time_steps(scan_fused, args, iters=16, repeats=5)
    t_v = time_steps(scan_virtual, args, iters=16, repeats=5)
    print(f"unfused chain: {t_u*1e3:.3f} ms = {t_u/L*1e6:.1f} us/layer")
    print(f"fused kernel:  {t_f*1e3:.3f} ms = {t_f/L*1e6:.1f} us/layer "
          f"(saves {(t_u-t_f)/L*1e6:.1f} us/layer)")
    print(f"virtual+writer: {t_v*1e3:.3f} ms = {t_v/L*1e6:.1f} us/layer "
          f"(saves {(t_u-t_v)/L*1e6:.1f} us/layer)")


if __name__ == "__main__":
    main()
