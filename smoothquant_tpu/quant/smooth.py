"""SmoothQuant smoothing — a pure pytree→pytree weight transform.

Migrates activation outliers into weights: for a norm feeding a set of
linears, compute per-channel s = clamp(act_max^α / w_max^(1-α), 1e-5), divide
the norm's weight (and bias, if any) by s, and multiply the linears' input
columns by s (cf. /root/reference/smoothquant/smooth.py:18-71).  The graph is
unchanged — smoothing is a load-time rewrite.

Architecture-specific norm→linears pairing lives in each model module as a
`smoothing_map(cfg)`; `smooth_model` below applies it generically to a params
pytree (the TPU equivalent of smooth_lm, smooth.py:74-160).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

_EPS = 1e-5


def compute_smoothing_scales(
    act_scales: jax.Array, weights: Sequence[jax.Array], alpha: float
) -> jax.Array:
    """s = clamp(act^α / w^(1-α), 1e-5), float32.

    act_scales: (C,) per-channel absmax of the linears' input activations.
    weights: each (out_i, C); w_max is the column-wise absmax over the
    concatenation of all consuming linears (smooth.py:29-32).
    """
    a = jnp.asarray(act_scales, dtype=jnp.float32)
    w_max = jnp.max(
        jnp.stack([jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) for w in weights]),
        axis=0,
    )
    w_max = jnp.maximum(w_max, _EPS)
    s = jnp.power(a, alpha) / jnp.power(w_max, 1.0 - alpha)
    return jnp.maximum(s, _EPS)


def smooth_norm_linears(
    norm_params: dict,
    linear_params: Sequence[dict],
    act_scales: jax.Array,
    alpha: float = 0.5,
) -> tuple[dict, list[dict]]:
    """Fold smoothing scales into one norm and its consuming linears.

    Equivalent to smooth_ln_fcs / smooth_ln_fcs_llama_like
    (smooth.py:18-71); works for both LayerNorm (with bias) and RMSNorm.
    """
    weights = [p["weight"] for p in linear_params]
    s = compute_smoothing_scales(act_scales, weights, alpha)

    new_norm = dict(norm_params)
    nw = norm_params["weight"]
    new_norm["weight"] = (nw.astype(jnp.float32) / s).astype(nw.dtype)
    if norm_params.get("bias") is not None:
        nb = norm_params["bias"]
        new_norm["bias"] = (nb.astype(jnp.float32) / s).astype(nb.dtype)

    new_linears = []
    for p in linear_params:
        q = dict(p)
        w = p["weight"]
        q["weight"] = (w.astype(jnp.float32) * s[None, :]).astype(w.dtype)
        new_linears.append(q)
    return new_norm, new_linears


def _get_path(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set_path(tree, path, value):
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _set_path(tree[path[0]], path[1:], value)
    return new


def smooth_model(params: dict, smoothing_map, act_scales: dict, alpha: float = 0.5) -> dict:
    """Apply smoothing across a whole model params pytree.

    smoothing_map: iterable of (norm_path, [linear_paths], scales_key) where
    paths are key-tuples into `params` and scales_key indexes `act_scales`
    (HF-style module names, e.g. "model.layers.0.self_attn.q_proj", so
    reference-produced act-scales files remain loadable).
    """
    for norm_path, linear_paths, scales_key in smoothing_map:
        if scales_key not in act_scales:
            raise KeyError(f"activation scales missing key: {scales_key}")
        norm_p = _get_path(params, norm_path)
        linear_ps = [_get_path(params, p) for p in linear_paths]
        new_norm, new_linears = smooth_norm_linears(
            norm_p, linear_ps, jnp.asarray(act_scales[scales_key]), alpha
        )
        params = _set_path(params, norm_path, new_norm)
        for p, lp in zip(linear_paths, new_linears):
            params = _set_path(params, p, lp)
    return params
