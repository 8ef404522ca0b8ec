"""Quantized linear layer — functional TPU equivalent of W4A4Linear.

The reference's W4A4Linear (fake_quant.py:209-374) is an nn.Module holding
Q-DQ'd FP16 weights and an on-the-fly activation quantizer with optional
salient-channel passthrough.  Here the same capability is a pair of pure
functions over a params pytree:

  * quantize_linear_params(params, cfg, importance) — offline weight Q-DQ
    with salient-column restore (from_float, fake_quant.py:324-371).
  * quant_linear(params, x, cfg, quantize_output) — the forward pass
    (fake_quant.py:279-322): on-the-fly activation Q-DQ (skipping salient
    channels), matmul, optional output Q-DQ.

Layout convention: params["weight"] has shape (out_features, in_features)
(same orientation as torch Linear / HF checkpoints); y = x @ W.T + b.

Documented divergence from the reference (SURVEY.md §2.2 "known quirks"):
output-side quantization here is salient-agnostic (full Q-DQ of the output).
The reference reuses the *input*-channel salient mask on output columns
(fake_quant.py:309-314), which is only dimensionally valid for square layers
and conceptually wrong; we do not replicate it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoothquant_tpu.quant import core
from smoothquant_tpu.quant.config import QuantConfig
from smoothquant_tpu.quant.saliency import salient_partition_perm, select_salient_indices

LinearParams = dict


def linear(params: LinearParams, x: jax.Array) -> jax.Array:
    """Plain (unquantized) linear: y = x @ W.T + b."""
    y = x @ params["weight"].T.astype(x.dtype)
    if params.get("bias") is not None:
        y = y + params["bias"].astype(x.dtype)
    return y


def quantize_linear_params(
    params: LinearParams,
    cfg: QuantConfig,
    importance: Optional[np.ndarray] = None,
) -> LinearParams:
    """Offline weight quantization with salient-column restore.

    Mirrors W4A4Linear.from_float (fake_quant.py:324-371): Q-DQ the full
    weight at cfg.weight_quant granularity, then restore the salient input
    columns (selected by descending importance) to their original values.

    The returned params carry the salient partition permutation as concrete
    arrays ("sal_perm"/"sal_inv_perm") so the forward pass is shape-static.
    """
    w = params["weight"]
    out_features, in_features = w.shape
    k = cfg.num_salient(in_features) if importance is not None else 0

    wq_fn = core.get_weight_quantizer(cfg.weight_quant, cfg.quant_bits,
                                      cfg.group_size, cfg.sort_strategy)
    w_q = wq_fn(w)

    new = {"weight": w_q, "bias": params.get("bias")}
    if k > 0:
        sal_idx = select_salient_indices(np.asarray(importance), k)
        perm, inv_perm = salient_partition_perm(in_features, sal_idx)
        # Restore salient columns to original precision (fake_quant.py:363-365).
        w_q = w_q.at[:, jnp.asarray(sal_idx)].set(w[:, jnp.asarray(sal_idx)])
        new["weight"] = w_q
        new["sal_perm"] = jnp.asarray(perm)
        new["sal_inv_perm"] = jnp.asarray(inv_perm)
        new["salient_indices"] = jnp.asarray(sal_idx)
    return new


def _act_qdq(x2d: jax.Array, params: LinearParams, cfg: QuantConfig) -> jax.Array:
    """On-the-fly activation Q-DQ honoring salient channels.

    Non-salient columns are compacted (via the static load-time permutation),
    quantized as one matrix — so per-token scales and group boundaries are
    computed over non-salient channels only, exactly as the reference's
    `x[:, non_salient_mask]` compaction (fake_quant.py:291-301) — and
    scattered back; salient columns pass through untouched.
    """
    aq_fn = core.get_act_quantizer(cfg.act_quant, cfg.effective_act_bits,
                                   cfg.group_size, cfg.sort_strategy)
    if "sal_perm" not in params:
        return aq_fn(x2d)
    c = x2d.shape[-1]
    k = params["salient_indices"].shape[0]
    x_p = jnp.take(x2d, params["sal_perm"], axis=-1)
    x_ns, x_s = x_p[:, : c - k], x_p[:, c - k :]
    q_ns = aq_fn(x_ns)
    return jnp.take(jnp.concatenate([q_ns, x_s], axis=-1), params["sal_inv_perm"], axis=-1)


def quant_linear(
    params: LinearParams,
    x: jax.Array,
    cfg: QuantConfig,
    quantize_output: bool = False,
) -> jax.Array:
    """Quantized-linear forward (W4A4Linear.forward, fake_quant.py:279-322).

    x: (..., in_features).  quantize_output applies the same activation
    quantizer to the layer output (used to simulate quantized BMM inputs on
    q/k/v projections when cfg.quantize_bmm_input is set).
    """
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    q_x = _act_qdq(x2d, params, cfg)
    y = q_x @ params["weight"].T.astype(q_x.dtype)
    if params.get("bias") is not None:
        y = y + params["bias"].astype(y.dtype)
    if quantize_output:
        aq_fn = core.get_act_quantizer(cfg.act_quant, cfg.effective_act_bits,
                                       cfg.group_size, cfg.sort_strategy)
        y = aq_fn(y)
    return y.reshape(*shape[:-1], y.shape[-1])
