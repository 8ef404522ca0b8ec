"""Profiler A/B over the S-major attention kernel's (tile_s, b_chunk) at
bench dims: per-op custom-call durations (ground truth on the tunnel)."""

import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 32


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"platform={jax.devices()[0].platform}")

    from smoothquant_tpu.kernels.attn_smajor import (
        decode_attention_smajor_stacked,
    )
    from smoothquant_tpu.kernels.decode_attention import (
        decode_attention_stacked,
    )

    L, B, H, S, D = 8, 4, 32, 512, 128
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(B, H, D)), jnp.bfloat16)
    k_sm = jnp.asarray(rng.integers(-127, 128, size=(L, B, S, H * D)),
                       jnp.int8)
    v_sm = jnp.asarray(rng.integers(-127, 128, size=(L, B, S, H * D)),
                       jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, size=(L, B, H, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, size=(L, B, H, S)), jnp.float32)
    k_hm = jnp.asarray(rng.integers(-127, 128, size=(L, B, H, S, D)),
                       jnp.int8)
    v_hm = jnp.asarray(rng.integers(-127, 128, size=(L, B, H, S, D)),
                       jnp.int8)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    bias = jnp.where(col < S - 32, 0.0, -1e30).astype(jnp.float32)
    li = jnp.zeros((1,), jnp.int32)

    def chained(fn):
        @jax.jit
        def run(qq):
            def body(i, s_):
                t = qq + jnp.minimum(s_, 0.0).astype(qq.dtype)
                return jnp.mean(fn(t).astype(jnp.float32))
            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
        return run

    def prof(name, fn):
        run = chained(fn)
        try:
            float(run(q0))
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return
        tmpd = tempfile.mkdtemp(prefix=f"sma_{name}_")
        with jax.profiler.trace(tmpd):
            float(run(q0))
        xs = glob.glob(os.path.join(tmpd, "**", "*.xplane.pb"),
                       recursive=True)
        pd = jax.profiler.ProfileData.from_file(xs[0])
        agg = collections.defaultdict(float)
        for plane in pd.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    agg[ev.name.split(".")[0]] += ev.duration_ns / 1e3
        kern = sum(v for k, v in agg.items()
                   if "attn" in k or "attention" in k) / STEPS
        log(f"{name}: attention custom-call {kern:.1f} us/iter")

    prof("headmajor", lambda t: decode_attention_stacked(
        li, t, k_hm, v_hm, bias, ks, vs))
    for ts in (256, 512):
        for bc in (1, 2, 4):
            if bc * ts * H * D > 4 * 1024 * 1024 + 1:
                continue
            prof(f"sm_ts{ts}_bc{bc}", lambda t, ts=ts, bc=bc:
                 decode_attention_smajor_stacked(
                     li, t, k_sm, v_sm, bias, ks, vs, tile_s=ts, b_chunk=bc))


if __name__ == "__main__":
    main()
