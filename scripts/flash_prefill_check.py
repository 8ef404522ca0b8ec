"""TPU numeric check: the Pallas flash prefill path vs the einsum reference
(attention() routes causal no-mask prefill to flash on TPU only)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def log(m): print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
log(f"platform={jax.devices()[0].platform}")

from smoothquant_tpu.models.common import attention, to_head_major
rng = np.random.default_rng(0)
b, s, h, d = 1, 1024, 32, 128
q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
khm, vhm = to_head_major(k), to_head_major(v)

@jax.jit
def fl(q, k, v):
    return attention(q, k, v)

@jax.jit
def ein(q, k, v):
    # force einsum by passing a trivially-true mask
    mask = jnp.ones((b, s), jnp.int32)
    return attention(q, k, v, attn_mask=mask)

a1 = np.asarray(fl(q, khm, vhm), np.float32)
a2 = np.asarray(ein(q, khm, vhm), np.float32)
err = np.max(np.abs(a1 - a2))
log(f"flash vs einsum max abs err: {err:.4f} (bf16-scale values)")
assert err < 0.1, err
log("OK")
