"""Load-time weight packing for the real quantized execution path.

Turns an FP linear weight + quantization recipe + calibration stats into the
static TPU layout consumed by kernels.quant_matmul.dual_path_matmul:

  * a single static channel permutation [non-salient (magnitude-sorted) |
    salient], replacing the reference's two dynamic mechanisms — boolean-mask
    salient compaction (fake_quant.py:291-304) and per-call argsort grouping
    (fake_quant.py:104-154) — with a load-time layout decision (SURVEY.md §7
    "hard parts").  The sort key is the calibrated per-channel activation
    absmax when available (it drives both act-group quality and, via
    smoothing, weight-group quality), else the weight's column absmax (the
    reference's weight-side key, fake_quant.py:162-167).
  * int4-range weight values in an int8 container, stored TRANSPOSED
    (K_ns, O) — the MXU B-operand layout the kernel wants — with per-group
    f32 scales (K_ns/group_size, O), zero-padded to whole groups,
  * the salient columns as a dense bf16 block (K_s_pad, O), lane-padded.

Weight numerics match quant/core.group_quant_params exactly, so the packed
path Q-DQs bit-identically to the simulation in the permuted domain.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoothquant_tpu.quant import core
from smoothquant_tpu.quant.config import QuantConfig
from smoothquant_tpu.quant.saliency import select_salient_indices

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedLinear:
    """Static-layout quantized linear params (a pytree)."""

    w_qt: jax.Array         # (K_ns, O) int8, int4-range values
    w_scales_t: jax.Array   # (K_ns // group_size, O) f32
    w_sal_t: jax.Array      # (K_s_pad, O) compute dtype
    bias: Optional[jax.Array]
    perm: jax.Array         # (C,) int32: x[:, perm] = [non-salient | salient]
    meta: "PackedMeta" = dataclasses.field(metadata=dict(static=True))


@dataclasses.dataclass(frozen=True)
class PackedMeta:
    in_features: int
    out_features: int
    num_salient: int        # true salient count (before lane padding)
    k_ns: int               # padded non-salient width (multiple of group_size)
    k_s: int                # padded salient width (multiple of LANE; 0 if none)
    group_size: int         # effective group size in the packed domain
    nibble: bool = False    # w_qt holds (k_ns/2, O) split-half packed bytes


def effective_group_size(cfg: QuantConfig, k_ns_raw: int) -> int:
    """Map the recipe's weight granularity onto the packed group axis.

    per_group → cfg.group_size; per_channel → one group spanning all
    non-salient channels (scale per output row); per_tensor is handled by
    per_channel groups with a shared scale upstream.
    """
    if cfg.weight_quant in ("per_group", "per_group_unsorted"):
        return cfg.group_size
    return max(k_ns_raw, 1)


def pack_linear(
    params: dict,
    cfg: QuantConfig,
    importance: Optional[np.ndarray] = None,
    act_absmax: Optional[np.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    nibble: bool = False,
) -> PackedLinear:
    """Build the packed layout from FP linear params {"weight", "bias"}.

    Only the permutation/salient selection runs on host (tiny vectors); the
    heavy permute/pad/quantize work is jitted on device — packing a 7B model
    is bandwidth-, not Python-, bound.

    nibble=True stores weights two-per-byte (split-half layout; requires
    quant_bits <= 4) — 4 bits/element in HBM, decode-optimal; only the
    int-compute kernel can consume it.
    """
    w = params["weight"]
    o, c = w.shape
    if nibble and cfg.quant_bits > 4:
        raise ValueError("nibble packing requires quant_bits <= 4")

    k = cfg.num_salient(c) if importance is not None else 0
    sal_idx = select_salient_indices(np.asarray(importance), k) if k else np.zeros(0, np.int32)
    is_sal = np.zeros(c, dtype=bool)
    is_sal[sal_idx] = True
    ns_idx = np.nonzero(~is_sal)[0]

    # static sort of non-salient channels by magnitude key
    if cfg.weight_quant == "per_group" or cfg.act_quant == "per_group":
        key = (np.asarray(act_absmax, np.float64)[ns_idx]
               if act_absmax is not None
               else np.asarray(jnp.max(jnp.abs(jnp.asarray(w)), axis=0))[ns_idx])
        ns_idx = ns_idx[np.argsort(key, kind="stable")]

    perm = np.concatenate([ns_idx, np.sort(sal_idx)]).astype(np.int32)
    k_ns_raw = c - k

    g = effective_group_size(cfg, k_ns_raw)
    k_ns = _ceil_to(max(k_ns_raw, 1), g)
    if nibble:
        # both halves must hold whole groups: k_ns multiple of 2*group_size
        k_ns = _ceil_to(k_ns, 2 * g)
    k_s = _ceil_to(k, LANE) if k else 0  # no salient block at all when p=0

    w_qt, scales_t, w_sal_t = _pack_device(
        jnp.asarray(w), jnp.asarray(perm),
        k_ns_raw=k_ns_raw, k_ns=k_ns, k_s=k_s, g=g,
        weight_quant=cfg.weight_quant, quant_bits=cfg.quant_bits,
        compute_dtype=jnp.dtype(compute_dtype),
    )
    if nibble:
        w_qt = _nibble_pack_device(w_qt)

    bias = params.get("bias")
    return PackedLinear(
        w_qt=w_qt,
        w_scales_t=scales_t,
        w_sal_t=w_sal_t,
        bias=None if bias is None else jnp.asarray(bias),
        perm=jnp.asarray(perm),
        meta=PackedMeta(
            in_features=c, out_features=o, num_salient=k,
            k_ns=k_ns, k_s=k_s, group_size=g, nibble=nibble,
        ),
    )


@jax.jit
def _nibble_pack_device(w_qt: jax.Array) -> jax.Array:
    """(K, O) int8 int4-range → (K/2, O) split-half packed bytes (device)."""
    k = w_qt.shape[0]
    lo = w_qt[: k // 2].astype(jnp.uint8) & 0x0F
    hi = (w_qt[k // 2 :].astype(jnp.uint8) & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("k_ns_raw", "k_ns", "k_s", "g", "weight_quant",
                     "quant_bits", "compute_dtype"),
)
def _pack_device(w, perm, *, k_ns_raw, k_ns, k_s, g, weight_quant, quant_bits,
                 compute_dtype):
    o = w.shape[0]
    w_perm = jnp.take(w.astype(jnp.float32), perm, axis=1)
    w_ns = w_perm[:, :k_ns_raw]
    if k_ns != k_ns_raw:
        w_ns = jnp.pad(w_ns, ((0, 0), (0, k_ns - k_ns_raw)))
    k = w.shape[1] - k_ns_raw
    w_sal = jnp.zeros((o, k_s), jnp.float32)
    if k:
        w_sal = w_sal.at[:, :k].set(w_perm[:, k_ns_raw:])

    if weight_quant == "per_tensor":
        scale = core.compute_scale(jnp.max(jnp.abs(w_ns)), quant_bits)
        scales = jnp.broadcast_to(scale, (o, k_ns // g)).astype(jnp.float32)
        q = jnp.round(w_ns / scale).astype(jnp.int8)
    else:
        q3, s3 = core.group_quant_params(w_ns, quant_bits, g)
        q = q3.reshape(o, k_ns)
        scales = s3.reshape(o, k_ns // g)
    return q.T, scales.T, w_sal.T.astype(compute_dtype)


def quantize_activations_packed(
    x_perm: jax.Array, meta: PackedMeta, cfg: QuantConfig
) -> tuple[jax.Array, jax.Array]:
    """Split a permuted activation into (Q-DQ'd non-salient, salient).

    x_perm: (N, C) already permuted by PackedLinear.perm.  Non-salient
    channels are zero-padded to k_ns and quantized at cfg.act_quant
    granularity; because the static permutation already ordered channels by
    magnitude, the "sorted" group variant reduces to plain contiguous
    grouping here.
    """
    n = x_perm.shape[0]
    k_ns_raw = meta.in_features - meta.num_salient
    x_ns = x_perm[:, :k_ns_raw]
    if meta.k_ns != k_ns_raw:
        x_ns = jnp.pad(x_ns, ((0, 0), (0, meta.k_ns - k_ns_raw)))

    if cfg.act_quant == "per_token":
        x_ns_q = core.quantize_activation_per_token_absmax(x_ns, cfg.effective_act_bits)
    elif cfg.act_quant == "per_tensor":
        x_ns_q = core.quantize_activation_per_tensor_absmax(x_ns, cfg.effective_act_bits)
    else:  # per_group (static-sorted) / per_group_unsorted
        x_ns_q = core.quantize_activation_per_group_absmax(
            x_ns, cfg.effective_act_bits, cfg.group_size
        )

    x_sal = jnp.zeros((n, meta.k_s), x_perm.dtype)
    if meta.num_salient:
        x_sal = x_sal.at[:, : meta.num_salient].set(x_perm[:, k_ns_raw:])
    return x_ns_q, x_sal


def quantize_activations_packed_int(
    x_perm: jax.Array, meta: PackedMeta, cfg: QuantConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Integer-domain variant for the int-compute kernel.

    Returns (x_q int8 (N, k_ns), x_scales f32 (N, G_w), x_sal) where G_w =
    k_ns // meta.group_size and the activation scale is constant within each
    weight group (required for the output-side scale factorization).  The
    dequantized product x_q * x_scales reproduces quantize_activations_packed
    bit-for-bit for per_token / per_tensor / matching per_group recipes.
    """
    from smoothquant_tpu.quant.core import compute_scale

    n = x_perm.shape[0]
    k_ns_raw = meta.in_features - meta.num_salient
    g_w = meta.k_ns // meta.group_size
    x_ns = x_perm[:, :k_ns_raw]
    if meta.k_ns != k_ns_raw:
        x_ns = jnp.pad(x_ns, ((0, 0), (0, meta.k_ns - k_ns_raw)))
    xf = x_ns.astype(jnp.float32)

    if cfg.act_quant == "per_token":
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scales = compute_scale(absmax, cfg.effective_act_bits)  # (N, 1)
        x_q = jnp.round(xf / scales).astype(jnp.int8)
        x_scales = jnp.broadcast_to(scales, (n, g_w))
    elif cfg.act_quant == "per_tensor":
        scale = compute_scale(jnp.max(jnp.abs(xf)), cfg.effective_act_bits)
        x_q = jnp.round(xf / scale).astype(jnp.int8)
        x_scales = jnp.broadcast_to(scale, (n, g_w))
    else:  # per-group: activation groups must align with weight groups
        if cfg.group_size != meta.group_size:
            raise ValueError(
                f"int-compute path needs act group_size == weight group_size "
                f"({cfg.group_size} != {meta.group_size})"
            )
        xg = xf.reshape(n, g_w, meta.group_size)
        absmax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
        scales = compute_scale(absmax, cfg.effective_act_bits)  # (N, G, 1)
        x_q = jnp.round(xg / scales).astype(jnp.int8).reshape(n, meta.k_ns)
        x_scales = scales[..., 0]

    x_sal = jnp.zeros((n, meta.k_s), x_perm.dtype)
    if meta.num_salient:
        x_sal = x_sal.at[:, : meta.num_salient].set(x_perm[:, k_ns_raw:])
    return x_q, x_scales.astype(jnp.float32), x_sal
