"""Profiler ground truth for the prefill candidates: per-op device times
from jax.profiler xplane (the two-point wall differencing disagrees with
itself between processes on the tunneled chip — op durations do not)."""

import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 16


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
    c = meta.in_features
    sal_idx = pk.perm[c - meta.num_salient:]
    ns = jnp.ones((c,), jnp.float32).at[sal_idx].set(0.0)
    sw_t = pk.w_scales_t.astype(jnp.float32).reshape(1, -1)
    wt = w.T

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

    def chained(fn):
        @jax.jit
        def run(xx):
            def body(i, s):
                t = xx + jnp.minimum(s, 0.0).astype(xx.dtype)
                return jnp.mean(fn(t).astype(jnp.float32))
            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
        return run

    def f_bf16(t):
        return jnp.dot(t, wt, preferred_element_type=jnp.float32
                       ).astype(t.dtype)

    def f_raw(t):
        # real data dependence: round(tiny) is 0 but not provably so
        x_q = jnp.round(t[:1, :1] * 1e-12).astype(jnp.int8) + \
            jnp.round((t.astype(jnp.float32) * ns[None, :])
                      / compute_scale(jnp.max(jnp.abs(
                          t.astype(jnp.float32) * ns[None, :]), axis=-1,
                          keepdims=True), 8)).astype(jnp.int8)
        return jax.lax.dot_general(
            x_q, pk.w_qt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def f_xla_full(t):
        x_q, sx, x_sal = prologue(t)
        acc = jax.lax.dot_general(
            x_q, pk.w_qt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sx * sw_t
        y = y + jax.lax.dot_general(
            x_sal, pk.w_sal_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    def mk_kern(to):
        def f(t):
            x_q, sx, x_sal = prologue(t)
            return int8_prefill_matmul(x_q, sx, pk.w_qt, sw_t, x_sal,
                                       pk.w_sal_t, out_dtype=jnp.bfloat16,
                                       tile_n=1024, tile_o=to, tile_k=K)
        return f

    cands = [("bf16", f_bf16), ("raw_int8", f_raw),
             ("xla_full", f_xla_full), ("kern_to128", mk_kern(128)),
             ("kern_to256", mk_kern(256)), ("kern_to512", mk_kern(512))]

    for name, fn in cands:
        run = chained(fn)
        float(run(x))  # compile + warm
        tmpd = tempfile.mkdtemp(prefix=f"pf_{name}_")
        with jax.profiler.trace(tmpd):
            float(run(x))
        xs = glob.glob(os.path.join(tmpd, "**", "*.xplane.pb"),
                       recursive=True)
        pd = jax.profiler.ProfileData.from_file(xs[0])
        agg = collections.defaultdict(float)
        for plane in pd.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                if "step" in line.name.lower():
                    continue
                for ev in line.events:
                    agg[ev.name] += ev.duration_ns / 1e3
        total = sum(agg.values()) / STEPS
        log(f"{name}: device total {total:.1f} us/iter")
        for nm, us in sorted(agg.items(), key=lambda kv: -kv[1])[:6]:
            log(f"    {us/STEPS:8.1f} us  {nm[:100]}")


if __name__ == "__main__":
    main()
