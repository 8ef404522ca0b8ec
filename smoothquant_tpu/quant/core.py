"""Quantization primitive ops — the numerical contract of the framework.

Pure-jnp re-implementations of the reference's simulated ("fake") quantizers
(cf. /root/reference/smoothquant/fake_quant.py:9-207), redesigned for JAX/XLA:
everything here is a pure function of arrays, shape-static, and jit-safe.

Shared semantics (all quantizers):
  * symmetric signed quantization, no zero point
  * q_max = 2**(n_bits - 1) - 1  (e.g. 7 for int4, 127 for int8)
  * scale = max(absmax, 1e-5) / q_max   (absmax clamp BEFORE dividing,
    matching fake_quant.py:12-14)
  * round-to-nearest-even (jnp.round == torch.round semantics)
  * group quantizers zero-pad the channel axis on the right up to a multiple
    of group_size and strip the padding after Q-DQ
  * the *sorted* group variants rank channels by their column-wise absmax,
    quantize in sorted order (so channels of similar magnitude share a group
    scale), and inverse-permute back — the output layout is unchanged, only
    the grouping differs (cf. fake_quant.py:104-207).

All Q-DQ arithmetic is done in float32 and cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_weight_per_channel_absmax",
    "quantize_weight_per_tensor_absmax",
    "quantize_weight_per_group_absmax",
    "quantize_weight_per_group_absmax_sort",
    "quantize_activation_per_token_absmax",
    "quantize_activation_per_tensor_absmax",
    "quantize_activation_per_group_absmax",
    "quantize_activation_per_group_absmax_sort",
    "qdq",
    "compute_scale",
    "group_quant_params",
    "sorted_group_perm",
    "WEIGHT_QUANTIZERS",
    "ACT_QUANTIZERS",
]

_SCALE_FLOOR = 1e-5


def _qmax(n_bits: int) -> float:
    return float(2 ** (n_bits - 1) - 1)


def compute_scale(absmax: jax.Array, n_bits: int) -> jax.Array:
    """scale = clamp(absmax, 1e-5) / q_max, in float32."""
    return jnp.maximum(absmax.astype(jnp.float32), _SCALE_FLOOR) / _qmax(n_bits)


def qdq(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric quantize-dequantize with a broadcastable scale (float32 math)."""
    xf = x.astype(jnp.float32)
    return (jnp.round(xf / scale) * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# Weight quantizers.  w: (out_features, in_features)
# ---------------------------------------------------------------------------


def quantize_weight_per_channel_absmax(w: jax.Array, n_bits: int) -> jax.Array:
    """One scale per output row (cf. fake_quant.py:9-16)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1, keepdims=True)
    return qdq(w, compute_scale(absmax, n_bits))


def quantize_weight_per_tensor_absmax(w: jax.Array, n_bits: int) -> jax.Array:
    """Single scalar scale for the whole weight (cf. fake_quant.py:19-26)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)))
    return qdq(w, compute_scale(absmax, n_bits))


def _pad_to_groups(x2d: jax.Array, group_size: int) -> tuple[jax.Array, int]:
    """Zero-pad the last axis up to a multiple of group_size."""
    c = x2d.shape[-1]
    num_groups = -(-c // group_size)
    pad = num_groups * group_size - c
    if pad:
        x2d = jnp.pad(x2d, ((0, 0), (0, pad)))
    return x2d, num_groups


def _group_qdq_2d(x2d: jax.Array, n_bits: int, group_size: int) -> jax.Array:
    """Q-DQ a (N, C) matrix with per-(row, group) scales over the last axis."""
    n, c = x2d.shape
    padded, num_groups = _pad_to_groups(x2d, group_size)
    g = padded.reshape(n, num_groups, group_size)
    absmax = jnp.max(jnp.abs(g.astype(jnp.float32)), axis=-1, keepdims=True)
    out = qdq(g, compute_scale(absmax, n_bits))
    return out.reshape(n, num_groups * group_size)[:, :c]


def quantize_weight_per_group_absmax(
    w: jax.Array, n_bits: int, group_size: int = 128
) -> jax.Array:
    """Per-(row, group-of-group_size-input-channels) scales (fake_quant.py:29-53)."""
    return _group_qdq_2d(w, n_bits, group_size)


SORT_STRATEGIES = ("max", "mean_std", "argmax")


def sort_key(x2d: jax.Array, strategy: str = "max") -> jax.Array:
    """Per-column scalar ranking channels for sorted-group quantization.

    The reference implements only "max" in code (fake_quant.py:113-121,
    162-173) but its README claims three strategies (README.md:34-37):
      max      — column-wise absmax (channels of similar magnitude group),
      mean_std — mean(|x|) + 3·std(|x|), an outlier-robust magnitude proxy,
      argmax   — the ROW INDEX where the column attains its absmax
                 (position-based: channels whose outliers co-occur group).
    """
    ax = jnp.abs(x2d.astype(jnp.float32))
    if strategy == "max":
        return jnp.max(ax, axis=0)
    if strategy == "mean_std":
        return jnp.mean(ax, axis=0) + 3.0 * jnp.std(ax, axis=0)
    if strategy == "argmax":
        return jnp.argmax(ax, axis=0).astype(jnp.float32)
    raise ValueError(f"sort strategy must be one of {SORT_STRATEGIES}")


def sorted_group_perm(x2d: jax.Array, strategy: str = "max") -> jax.Array:
    """Ascending permutation of columns by the chosen sort key.

    With "max" this is exactly the reference's dynamic sort
    (fake_quant.py:113-121, 162-173).
    """
    return jnp.argsort(sort_key(x2d, strategy))


def _sorted_group_qdq_2d(x2d: jax.Array, n_bits: int, group_size: int,
                         strategy: str = "max") -> jax.Array:
    perm = sorted_group_perm(x2d, strategy)
    inv_perm = jnp.argsort(perm)
    out_sorted = _group_qdq_2d(x2d[:, perm], n_bits, group_size)
    return out_sorted[:, inv_perm]


def quantize_weight_per_group_absmax_sort(
    w: jax.Array, n_bits: int, group_size: int = 128,
    sort_strategy: str = "max",
) -> jax.Array:
    """Sorted group quantization for weights (fake_quant.py:156-207).

    Columns are ranked by the sort key; grouping happens in sorted order;
    output is returned in the original column order.
    """
    return _sorted_group_qdq_2d(w, n_bits, group_size, sort_strategy)


# ---------------------------------------------------------------------------
# Activation quantizers.  t: (..., C); flattened to (N, C) internally.
# ---------------------------------------------------------------------------


def _flatten_last(t: jax.Array) -> tuple[jax.Array, tuple[int, ...]]:
    shape = t.shape
    return t.reshape(-1, shape[-1]), shape


def quantize_activation_per_token_absmax(t: jax.Array, n_bits: int) -> jax.Array:
    """One scale per token (row after flattening) — fake_quant.py:56-64."""
    t2d, shape = _flatten_last(t)
    absmax = jnp.max(jnp.abs(t2d.astype(jnp.float32)), axis=-1, keepdims=True)
    return qdq(t2d, compute_scale(absmax, n_bits)).reshape(shape)


def quantize_activation_per_tensor_absmax(t: jax.Array, n_bits: int) -> jax.Array:
    """Single scalar scale over the whole activation — fake_quant.py:67-75."""
    t2d, shape = _flatten_last(t)
    absmax = jnp.max(jnp.abs(t2d.astype(jnp.float32)))
    return qdq(t2d, compute_scale(absmax, n_bits)).reshape(shape)


def quantize_activation_per_group_absmax(
    t: jax.Array, n_bits: int, group_size: int = 128
) -> jax.Array:
    """Per-(token, channel-group) scales, unsorted — fake_quant.py:77-101."""
    t2d, shape = _flatten_last(t)
    return _group_qdq_2d(t2d, n_bits, group_size).reshape(shape)


def quantize_activation_per_group_absmax_sort(
    t: jax.Array, n_bits: int, group_size: int = 128,
    sort_strategy: str = "max",
) -> jax.Array:
    """Sorted per-group activation quantization — fake_quant.py:104-154.

    The permutation is computed dynamically per call from the activation
    itself (sort key over the flattened batch), exactly as the reference
    does.  For the real TPU execution path, prefer a static calibration-time
    permutation (see kernels/ and quant/saliency.py) — this function is the
    numerical oracle.
    """
    t2d, shape = _flatten_last(t)
    return _sorted_group_qdq_2d(t2d, n_bits, group_size, sort_strategy).reshape(shape)


# ---------------------------------------------------------------------------
# Integer-domain helpers for the real-kernel path: return int values + scales
# instead of Q-DQ floats.
# ---------------------------------------------------------------------------


def group_quant_params(
    w: jax.Array, n_bits: int, group_size: int
) -> tuple[jax.Array, jax.Array]:
    """Quantize (out, in) weight to integer group values + per-group scales.

    Returns (q, scales) with q int8-stored values in [-q_max, q_max], shape
    (out, num_groups, group_size) zero-padded, and scales float32 shape
    (out, num_groups, 1).  Dequantization q * scales reproduces the Q-DQ
    output of quantize_weight_per_group_absmax bit-for-bit.
    """
    n, c = w.shape
    padded, num_groups = _pad_to_groups(w, group_size)
    g = padded.reshape(n, num_groups, group_size).astype(jnp.float32)
    scales = compute_scale(jnp.max(jnp.abs(g), axis=-1, keepdims=True), n_bits)
    q = jnp.round(g / scales).astype(jnp.int8)
    return q, scales


WEIGHT_QUANTIZERS = {
    "per_channel": quantize_weight_per_channel_absmax,
    "per_tensor": quantize_weight_per_tensor_absmax,
    "per_group": quantize_weight_per_group_absmax_sort,
    "per_group_unsorted": quantize_weight_per_group_absmax,
}

ACT_QUANTIZERS = {
    "per_token": quantize_activation_per_token_absmax,
    "per_tensor": quantize_activation_per_tensor_absmax,
    "per_group": quantize_activation_per_group_absmax_sort,
    "per_group_unsorted": quantize_activation_per_group_absmax,
}


def get_act_quantizer(name: str, n_bits: int, group_size: int = 128,
                      sort_strategy: str = "max"):
    """Build an activation quantizer closure by name.

    Mirrors the act_quant selection in W4A4Linear.__init__
    (fake_quant.py:246-256): "per_group" maps to the *sorted* variant.
    """
    fn = ACT_QUANTIZERS[name]
    if name == "per_group":
        return functools.partial(fn, n_bits=n_bits, group_size=group_size,
                                 sort_strategy=sort_strategy)
    if name == "per_group_unsorted":
        return functools.partial(fn, n_bits=n_bits, group_size=group_size)
    return functools.partial(fn, n_bits=n_bits)


def get_weight_quantizer(name: str, n_bits: int, group_size: int = 128,
                         sort_strategy: str = "max"):
    """Build a weight quantizer closure by name (fake_quant.py:348-361)."""
    fn = WEIGHT_QUANTIZERS[name]
    if name == "per_group":
        return functools.partial(fn, n_bits=n_bits, group_size=group_size,
                                 sort_strategy=sort_strategy)
    if name == "per_group_unsorted":
        return functools.partial(fn, n_bits=n_bits, group_size=group_size)
    return functools.partial(fn, n_bits=n_bits)
