"""Shared model building blocks.

The reference borrows its transformer implementation from HF transformers and
only swaps Linear/norm modules in place (SURVEY.md §1).  Here the models are
our own: pure functions over params pytrees.  This module holds the pieces
every architecture shares — norms, rotary embeddings, attention math, the
quantization-aware linear call, and the KV cache structure.

Params conventions:
  linear: {"weight": (out, in), "bias": (out,) | None, [salient keys]}
  norm:   {"weight": (C,), ["bias": (C,)]}
  layer stacks are dicts keyed by str(layer_index) so pytree paths are
  uniform string tuples.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from smoothquant_tpu.quant.calibrate import TapCollector
from smoothquant_tpu.quant.config import QuantConfig
from smoothquant_tpu.quant.linear import linear as plain_linear
from smoothquant_tpu.quant.linear import quant_linear

NEG_INF = -1e9


@dataclasses.dataclass
class ForwardContext:
    """Per-call context threaded through a model forward pass.

    quant: when set, weight-quantized linears apply on-the-fly activation
      quantization (the simulated path).  Params must have been produced by
      quantize_model_params (dict linears) or pack_model (PackedLinear —
      the real-kernel path; `compute` selects int/dequant/auto kernels).
    taps: when set, every quantizable linear reports input (and output)
      statistics for calibration (replaces the reference's torch hooks).
    """

    quant: Optional[QuantConfig] = None
    taps: Optional[TapCollector] = None
    compute: str = "auto"  # real-path kernel choice: auto | int | dequant
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU)
    tp_axis: Optional[str] = None  # inside shard_map: packed-linear outputs
    #                                are computed on local O-shards and
    #                                combined over this mesh axis per
    #                                meta.tp_reduce (gather / psum / none)
    moe_dispatch: str = "dense"  # MoE execution: "dense" computes every
    #                              expert weighted by routing probs (XLA-
    #                              trivial, reference-equivalent numerics);
    #                              "sparse" gathers routed tokens into
    #                              capacity-bounded per-expert buffers —
    #                              top-k/E of the dense FLOPs
    moe_capacity_factor: float = 2.0  # sparse buffer slack: capacity =
    #                                   ceil(topk * n / E * factor)
    ep_axis: Optional[str] = None  # inside shard_map: experts are sharded
    #                                over this mesh axis; each device runs
    #                                its local experts and the combined MoE
    #                                output is psum'd
    tp_overlap_chunks: int = 0  # Megatron row-parallel (tp_reduce="psum")
    #                             linears: split the token axis into this
    #                             many independent chunks, each with its own
    #                             psum — XLA's latency-hiding scheduler
    #                             overlaps chunk c's all-reduce with chunk
    #                             c+1's matmul (the north-star "collectives
    #                             overlapped with dequant+matmul";
    #                             bitwise-identical results).  0 = one
    #                             synchronous psum.  Effective for prefill
    #                             token counts (>= 8 rows per chunk).
    cp_axis: Optional[str] = None  # inside shard_map: the SEQUENCE axis is
    #                                sharded over this mesh axis and
    #                                no-cache (prefill) attention runs as
    #                                ring attention (parallel/cp.py) — K/V
    #                                chunks stream around the ring via
    #                                ppermute with a streaming softmax
    attn: str = "auto"  # cached-decode attention path: "kernel" = fused
    #                     Pallas flash-decode kernel, "einsum" = XLA
    #                     full-cache einsum, "auto" = kernel when the shape
    #                     supports it and the backend compiles Pallas
    #                     (TPU, or anywhere with interpret=True)
    fuse_attn: str = "auto"  # prefetch-scan decode attention composition
    #                          (int8 cache, unmasked):
    #   "auto":  VIRTUAL-TILE attention (kernels/attn_fused.py) — attention
    #            reads the OLD cache and folds the new position in from
    #            registers (rotary+quantize in-kernel, bias in-kernel); the
    #            aliased cache writer runs AFTER, off the critical path
    #            (WAR, not RAW — attention never waits on the row write).
    #   "fused": ALSO write the cache rows inside the attention kernel —
    #            one launch fewer, but the row write-back costs ~9 us/layer
    #            of dynamic_update_slice + async scale-copy glue (profiled
    #            in scripts/trace_timeline.py), so "auto" beats it.
    #   "off":   separate writer + bias + attention kernels — processes the
    #            new position inside its S-tile (exact softmax order; the
    #            fused variants fold it in last, an f32-rounding reorder).
    fuse_mlp: bool = False  # OPT-IN: run gate_up+SwiGLU+down as ONE Pallas
    #                         megakernel (kernels/mlp_fused.py) in the
    #                         prefetch-scan decode.  Wins 13% standalone but
    #                         measured ~5% SLOWER inside the full decode
    #                         scan (the scan pipeline already hides launch
    #                         overhead; the megakernel's VMEM-resident dual
    #                         weight sets trade against cross-kernel
    #                         prefetch) — scripts/mlp_scan_probe.py.


def call_linear(
    params,
    x: jax.Array,
    name: str,
    ctx: Optional[ForwardContext],
    quantize_output: bool = False,
    layer_idx: Optional[jax.Array] = None,
    norm: Optional[tuple] = None,
) -> jax.Array:
    """A quantizable linear call site.

    name is the HF-style module path (e.g. "model.layers.0.self_attn.q_proj")
    used for calibration stats and act-scales keys, so artifacts produced by
    the reference pipeline remain loadable.  layer_idx selects the layer of
    a LAYER-STACKED PackedLinear (leaves carrying a leading L axis) inside
    the prefetch-scan decode path.
    """
    from smoothquant_tpu.kernels.pack import PackedLinear

    if ctx is not None and ctx.taps is not None:
        ctx.taps.tap_input(name, x)
    if isinstance(params, dict) and "weight_t" in params:
        # transposed-fp decode layout (llama.pack_fp_decode): under scan
        # (layer_idx set) the stacked scalar-prefetch kernel streams only
        # layer i's tiles — the no-copy bf16 twin of the packed path
        from smoothquant_tpu.kernels.fp_matmul import fp_matmul_stacked

        interpret = ctx.interpret if ctx is not None else False
        x2d = x.reshape(-1, x.shape[-1])
        if layer_idx is not None:
            y = fp_matmul_stacked(
                jnp.asarray(layer_idx, jnp.int32).reshape(1), x2d,
                params["weight_t"], interpret=interpret)
            bias = params.get("bias")
            if bias is not None:
                y = y + bias[layer_idx].astype(y.dtype)
        else:
            y = jnp.dot(x2d, params["weight_t"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
            if params.get("bias") is not None:
                y = y + params["bias"].astype(y.dtype)
        y = y.reshape(*x.shape[:-1], y.shape[-1]).astype(x.dtype)
        if ctx is not None and ctx.taps is not None:
            ctx.taps.tap_output(name, y)
        return y
    if isinstance(params, PackedLinear):
        from smoothquant_tpu.kernels.real_linear import real_quant_linear
        from smoothquant_tpu.quant import core

        compute = ctx.compute if ctx is not None else "auto"
        interpret = ctx.interpret if ctx is not None else False
        if (ctx is not None and ctx.tp_axis is not None
                and params.meta.tp_reduce == "psum"):
            # Megatron row-parallel: local K-shard partial product, then
            # all-reduce; bias is stored pre-divided by tp so the psum
            # reconstitutes it exactly once.  tp_overlap_chunks > 1 splits
            # the token axis into independent (matmul, psum) chunks so the
            # collective of one chunk overlaps the next chunk's compute.
            ch = ctx.tp_overlap_chunks
            if (ch > 1 and x.ndim == 3 and x.shape[1] >= ch * 8
                    and x.shape[1] % ch == 0):
                step = x.shape[1] // ch
                parts = []
                prev = None
                for c in range(ch):
                    yc = real_quant_linear(
                        params, x[:, c * step:(c + 1) * step],
                        compute=compute, interpret=interpret,
                        layer_idx=layer_idx, norm=norm)
                    if prev is not None:
                        # chain ONLY the collectives: the barrier puts a
                        # dependency path between successive psums (so
                        # XLA's all-reduce combiner cannot re-merge the
                        # chunks) while chunk c+1's matmul stays
                        # independent of chunk c's in-flight all-reduce —
                        # the structure the latency-hiding scheduler
                        # overlaps on a real ICI mesh
                        yc, prev = jax.lax.optimization_barrier((yc, prev))
                    yc = jax.lax.psum(yc, ctx.tp_axis)
                    prev = yc
                    parts.append(yc)
                y = jnp.concatenate(parts, axis=1)
            else:
                y = real_quant_linear(params, x, compute=compute,
                                      interpret=interpret,
                                      layer_idx=layer_idx, norm=norm)
                y = jax.lax.psum(y, ctx.tp_axis)
        else:
            y = real_quant_linear(params, x, compute=compute,
                                  interpret=interpret, layer_idx=layer_idx,
                                  norm=norm)
            if (ctx is not None and ctx.tp_axis is not None
                    and params.meta.tp_reduce == "gather"):
                # v1 column-parallel: each device computed its O-shard
                y = jax.lax.all_gather(y, ctx.tp_axis, axis=-1, tiled=True)
            # tp_reduce == "none": output stays sharded (Megatron col layers)
        if (quantize_output and ctx is not None and ctx.quant is not None
                and ctx.quant.quantize_bmm_input):
            aq = core.get_act_quantizer(ctx.quant.act_quant,
                                        ctx.quant.effective_act_bits,
                                        ctx.quant.group_size,
                                        ctx.quant.sort_strategy)
            y = aq(y)
    elif ctx is not None and ctx.quant is not None:
        y = quant_linear(
            params,
            x,
            ctx.quant,
            quantize_output=quantize_output and ctx.quant.quantize_bmm_input,
        )
    else:
        y = plain_linear(params, x)
    if ctx is not None and ctx.taps is not None:
        ctx.taps.tap_output(name, y)
    return y


def maybe_quantize_output(y: jax.Array, ctx: Optional[ForwardContext]) -> jax.Array:
    """Apply the recipe's activation quantizer to a projection OUTPUT when
    quantize_bmm_input is on — used by fused q/k/v projections, which must
    quantize each split separately to match the reference's per-projection
    output quantization (fake_quant.py:258-263)."""
    if ctx is None or ctx.quant is None or not ctx.quant.quantize_bmm_input:
        return y
    from smoothquant_tpu.quant import core

    aq = core.get_act_quantizer(ctx.quant.act_quant,
                                ctx.quant.effective_act_bits,
                                ctx.quant.group_size,
                                ctx.quant.sort_strategy)
    return aq(y)


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["weight"].astype(jnp.float32)
    if params.get("bias") is not None:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(params: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * params["weight"].astype(jnp.float32)).astype(x.dtype)


def rotary_cos_sin(
    positions: jax.Array, head_dim: int, theta: float = 10000.0
) -> tuple[jax.Array, jax.Array]:
    """HF-Llama-style rotary tables: (..., seq, head_dim) with duplicated halves."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, n_heads, head_dim); cos/sin: (B or 1, S, head_dim)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    return x * cos + rotated * sin


class KVCache(NamedTuple):
    """Static-shape decode cache: k/v (B, n_kv_heads, max_len, head_dim).

    The (B, H, S, D) layout keeps S×D contiguous per head — the tiling the
    fused decode-attention kernel streams — and is what XLA prefers for the
    score einsum anyway.  update() accepts the model's natural projection
    layout (B, Sq, H, D) and transposes the (tiny) new slice internally.

    pos is either a scalar (all rows aligned — the simple generate path) or
    per-slot (B,) for continuous batching, where each slot's sequence has its
    own length.
    """

    k: jax.Array
    v: jax.Array
    pos: jax.Array  # () or (B,) int32: valid positions already written

    @classmethod
    def create(cls, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
               dtype, per_slot: bool = False):
        shape = (batch, n_kv_heads, max_len, head_dim)
        pos = jnp.zeros((batch,) if per_slot else (), jnp.int32)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype), pos=pos)

    def update(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Append k/v (B, Sq, H, D) for the current step(s) at self.pos."""
        k_new = k_new.transpose(0, 2, 1, 3).astype(self.k.dtype)
        v_new = v_new.transpose(0, 2, 1, 3).astype(self.v.dtype)
        if self.pos.ndim == 0:
            k = jax.lax.dynamic_update_slice(self.k, k_new, (0, 0, self.pos, 0))
            v = jax.lax.dynamic_update_slice(self.v, v_new, (0, 0, self.pos, 0))
        else:
            upd = jax.vmap(
                lambda buf, new, p: jax.lax.dynamic_update_slice(buf, new, (0, p, 0))
            )
            k = upd(self.k, k_new, self.pos)
            v = upd(self.v, v_new, self.pos)
        return KVCache(k=k, v=v, pos=self.pos + k_new.shape[2])

    def read(self) -> tuple[jax.Array, jax.Array]:
        """(B, H, S, D) key/value views for attention."""
        return self.k, self.v


class QuantKVCache(NamedTuple):
    """INT8 KV cache: values stored int8 with per-(slot, head, position)
    symmetric absmax scales — half the HBM footprint and read bandwidth of a
    bf16 cache.  Same (B, H, S, D) layout as KVCache; the fused decode kernel
    applies the scales to score/prob columns so the int8 bytes are the only
    cache traffic.  (North-star capability; the reference keeps stock HF fp
    caches, SURVEY.md §5 long-context row.)
    """

    k_q: jax.Array       # (B, H, max_len, D) int8
    v_q: jax.Array       # (B, H, max_len, D) int8
    k_scale: jax.Array   # (B, H, max_len) f32
    v_scale: jax.Array   # (B, H, max_len) f32
    pos: jax.Array       # () or (B,) int32

    @classmethod
    def create(cls, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
               dtype=None, per_slot: bool = False):
        del dtype  # storage is int8; read() dequantizes to bf16
        shape = (batch, n_kv_heads, max_len, head_dim)
        pos = jnp.zeros((batch,) if per_slot else (), jnp.int32)
        return cls(
            k_q=jnp.zeros(shape, jnp.int8), v_q=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:3], jnp.float32),
            v_scale=jnp.zeros(shape[:3], jnp.float32),
            pos=pos,
        )

    @staticmethod
    def _quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
        return q, scale

    def update(self, k_new: jax.Array, v_new: jax.Array) -> "QuantKVCache":
        """Append k/v (B, Sq, H, D) at self.pos."""
        kq, ks = self._quantize(k_new.transpose(0, 2, 1, 3))  # (B,H,Sq,D)
        vq, vs = self._quantize(v_new.transpose(0, 2, 1, 3))
        if self.pos.ndim == 0:
            at4 = lambda buf, new: jax.lax.dynamic_update_slice(
                buf, new, (0, 0, self.pos, 0))
            at3 = lambda buf, new: jax.lax.dynamic_update_slice(
                buf, new, (0, 0, self.pos))
            out = QuantKVCache(at4(self.k_q, kq), at4(self.v_q, vq),
                               at3(self.k_scale, ks), at3(self.v_scale, vs),
                               self.pos + kq.shape[2])
        else:
            u4 = jax.vmap(lambda buf, new, p: jax.lax.dynamic_update_slice(
                buf, new, (0, p, 0)))
            u3 = jax.vmap(lambda buf, new, p: jax.lax.dynamic_update_slice(
                buf, new, (0, p)))
            out = QuantKVCache(u4(self.k_q, kq, self.pos), u4(self.v_q, vq, self.pos),
                               u3(self.k_scale, ks, self.pos),
                               u3(self.v_scale, vs, self.pos),
                               self.pos + kq.shape[2])
        return out

    def read(self) -> tuple[jax.Array, jax.Array]:
        """(B, H, S, D) dequantized views (einsum fallback path)."""
        k = self.k_q.astype(jnp.float32) * self.k_scale[..., None]
        v = self.v_q.astype(jnp.float32) * self.v_scale[..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


class SMajorQuantKVCache(NamedTuple):
    """INT8 KV cache in S-MAJOR value layout: k_q/v_q (B, S, H_kv*D) — one
    cache row holds every head's vector for one position — with HEAD-major
    scales (B, H_kv, S).  This is the layout the batched-head decode
    attention kernel (kernels/attn_smajor.py) streams: 8 real query heads
    share one dot and one softmax, where the head-major layout issued one
    per head (VERDICT r4 round-5 demand #2).  Stacked (scan) form carries a
    leading L axis on every field.

    Numerics are identical to QuantKVCache (same per-(position, head)
    symmetric absmax int8); only the byte layout differs.
    """

    k_q: jax.Array       # (B, S, H_kv*D) int8
    v_q: jax.Array
    k_scale: jax.Array   # (B, H_kv, S) f32
    v_scale: jax.Array
    pos: jax.Array       # () or (B,) int32

    @classmethod
    def create(cls, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
               dtype=None, per_slot: bool = False):
        del dtype
        pos = jnp.zeros((batch,) if per_slot else (), jnp.int32)
        return cls(
            k_q=jnp.zeros((batch, max_len, n_kv_heads * head_dim), jnp.int8),
            v_q=jnp.zeros((batch, max_len, n_kv_heads * head_dim), jnp.int8),
            k_scale=jnp.zeros((batch, n_kv_heads, max_len), jnp.float32),
            v_scale=jnp.zeros((batch, n_kv_heads, max_len), jnp.float32),
            pos=pos,
        )

    @property
    def n_kv_heads(self) -> int:
        return self.k_scale.shape[-2]

    def update(self, k_new: jax.Array, v_new: jax.Array) -> "SMajorQuantKVCache":
        """Append k/v (B, Sq, H, D) at self.pos (jnp path — prefill and CPU
        fallbacks; the decode scan uses the fused Pallas writer)."""
        b, sq, h, d = k_new.shape
        kq, ks = QuantKVCache._quantize(k_new)   # (B, Sq, H, D) -> per-head
        vq, vs = QuantKVCache._quantize(v_new)
        kq = kq.reshape(b, sq, h * d)
        vq = vq.reshape(b, sq, h * d)
        ks = ks.transpose(0, 2, 1)               # (B, H, Sq)
        vs = vs.transpose(0, 2, 1)
        if self.pos.ndim == 0:
            out = self._replace(
                k_q=jax.lax.dynamic_update_slice(self.k_q, kq, (0, self.pos, 0)),
                v_q=jax.lax.dynamic_update_slice(self.v_q, vq, (0, self.pos, 0)),
                k_scale=jax.lax.dynamic_update_slice(
                    self.k_scale, ks, (0, 0, self.pos)),
                v_scale=jax.lax.dynamic_update_slice(
                    self.v_scale, vs, (0, 0, self.pos)),
                pos=self.pos + sq)
        else:
            u_v = jax.vmap(lambda buf, new, p: jax.lax.dynamic_update_slice(
                buf, new, (p, 0)))
            u_s = jax.vmap(lambda buf, new, p: jax.lax.dynamic_update_slice(
                buf, new, (0, p)))
            out = self._replace(
                k_q=u_v(self.k_q, kq, self.pos),
                v_q=u_v(self.v_q, vq, self.pos),
                k_scale=u_s(self.k_scale, ks, self.pos),
                v_scale=u_s(self.v_scale, vs, self.pos),
                pos=self.pos + sq)
        return out

    def read(self) -> tuple[jax.Array, jax.Array]:
        """(B, H, S, D) dequantized views (einsum fallback path)."""
        b, s, hd = self.k_q.shape
        h = self.n_kv_heads
        d = hd // h
        k = self.k_q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = self.v_q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.astype(jnp.float32) * self.k_scale[..., None]
        v = v.astype(jnp.float32) * self.v_scale[..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal_offset: jax.Array | int = 0,
    scale: Optional[float] = None,
    valid_len: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
    ctx: Optional["ForwardContext"] = None,
) -> jax.Array:
    """Scaled dot-product attention with causal masking and GQA.

    q: (B, Sq, n_heads, d); k/v: (B, n_kv_heads, Sk, d) — the KV cache's
    native head-major layout (fresh projections transpose their small
    (B, S, H, D) tensors on the way in).  kv heads are repeated to match q
    heads.  Query position i attends to key positions j <= i + causal_offset;
    positions >= valid_len (if given) are masked (used with a pre-allocated
    KV cache).  causal_offset and valid_len may be scalars or per-batch (B,)
    arrays (continuous batching).  attn_mask: optional (B, Sk) of {0,1}
    marking valid key positions (padding mask).  Softmax in float32
    (matching the reference INT8 path, opt.py:168-189).
    """
    if ctx is not None and ctx.cp_axis is not None:
        # context-parallel prefill: sequence-sharded q/k/v, KV chunks
        # stream around the ring (parallel/cp.py).  Local causal masking
        # only — callers express continuous-batching offsets via attn_mask.
        from smoothquant_tpu.parallel.cp import ring_attention

        assert valid_len is None, "cp prefill uses attn_mask, not valid_len"
        assert sliding_window is None, (
            "ring attention does not implement sliding windows")
        assert isinstance(causal_offset, int) and causal_offset == 0, (
            "cp prefill masks causally from the ring's global offsets; a "
            "nonzero causal_offset would be silently dropped here")
        return ring_attention(q, k, v, ctx.cp_axis, scale=scale,
                              attn_mask=attn_mask)

    b, sq, nh, d = q.shape
    n_kv = k.shape[1]
    if n_kv != nh:
        rep = nh // n_kv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if scale is None:
        scale = 1.0 / (d ** 0.5)

    # plain causal PREFILL on TPU rides jax's Pallas flash-attention: the
    # einsum path materializes (B, H, S, S) f32 scores in HBM (~0.5
    # ms/layer of the full-model prefill at S=1024, profiled in
    # scripts/prefill_model_profile.py); flash streams K/V tiles instead.
    # Masked / cached / windowed variants keep the einsum (exact-mask
    # reference semantics).
    if (attn_mask is None and valid_len is None and sliding_window is None
            and isinstance(causal_offset, int) and causal_offset == 0
            and sq == k.shape[2] and sq >= 256 and sq % 128 == 0
            and d % 64 == 0 and (ctx is None or not ctx.interpret)
            and jax.default_backend() == "tpu"):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes as _FlashBlocks,
            flash_attention as _flash,
        )

        def _blk(n, cap):
            for c in (cap, 512, 256, 128):
                if c <= cap and n % c == 0:
                    return c
            return min(n, 128)

        # measured at (1, 32, 1024, 128): default blocks 470 us, (q256,
        # k1024) 87 us — the default leaves the kernel grid-overhead-bound
        bs = _FlashBlocks(block_q=_blk(sq, 256),
                          block_k_major=_blk(sq, 1024),
                          block_k=_blk(sq, 1024), block_b=1)
        qh = q.transpose(0, 2, 1, 3).astype(jnp.bfloat16)   # (B, H, S, D)
        out = _flash(qh, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                     causal=True, sm_scale=float(scale), block_sizes=bs)
        return out.transpose(0, 2, 1, 3).astype(q.dtype)

    # (B, nh, Sq, Sk)
    scores = jnp.einsum("bqhd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale

    sk = k.shape[2]
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sq, sk), 2)
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, 1, sq, sk), 3)

    def per_batch(x):
        x = jnp.asarray(x)
        return x.reshape(-1, 1, 1, 1) if x.ndim == 1 else x

    mask = kj <= qi + per_batch(causal_offset)
    if sliding_window is not None:
        # Mistral sliding-window (HF modeling_mistral sliding-window mask):
        # query at absolute position p attends to keys in (p - W, p]
        mask = jnp.logical_and(
            mask, kj > qi + per_batch(causal_offset) - sliding_window)
    if valid_len is not None:
        mask = jnp.logical_and(mask, kj < per_batch(valid_len))
    if attn_mask is not None:
        mask = jnp.logical_and(mask, attn_mask[:, None, None, :].astype(bool))
    scores = jnp.where(mask, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bqhd", probs, v).astype(q.dtype)


def to_head_major(x: jax.Array) -> jax.Array:
    """(B, S, H, D) → (B, H, S, D) for the no-cache attention path."""
    return x.transpose(0, 2, 1, 3)


def cached_attention(
    q: jax.Array,
    cache,
    *,
    causal_offset: jax.Array | int,
    ctx: Optional[ForwardContext] = None,
    scale: Optional[float] = None,
    attn_mask: Optional[jax.Array] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Attention over an (already-updated) KVCache/QuantKVCache.

    Dispatches between the fused Pallas flash-decode kernel (single-query
    steps on shapes the kernel tiles) and the XLA einsum fallback.  The
    kernel folds cache-fill validity and the continuous-batching key mask
    into one additive bias, so both paths are numerically interchangeable
    (tests assert parity).
    """
    from smoothquant_tpu.kernels import decode_attention as da

    if isinstance(cache, SMajorQuantKVCache):
        # non-scan call sites (prefill, CPU fallback): einsum over the
        # dequantized view; the decode scan reaches the S-major kernel via
        # stacked_smajor_attention
        return attention(q, *cache.read(), causal_offset=causal_offset,
                         valid_len=cache.pos, scale=scale,
                         attn_mask=attn_mask, sliding_window=sliding_window)

    b, sq, nh, d = q.shape
    quant = isinstance(cache, QuantKVCache)
    kbuf = cache.k_q if quant else cache.k
    n_kv, s = kbuf.shape[1], kbuf.shape[2]

    mode = ctx.attn if ctx is not None else "auto"
    interpret = bool(ctx is not None and ctx.interpret)
    # auto: the fused kernel wins where it avoids HBM round-trips — the int8
    # cache, whose einsum path materializes a dequantized bf16 copy (measured
    # 1.3x on-chip); for bf16 caches XLA's einsum is already at bandwidth, so
    # auto keeps it and "kernel" remains an explicit override
    use_kernel = (
        mode != "einsum"
        and sq == 1
        and da.supported(s, nh, n_kv, d)
        and (mode == "kernel" or quant)
        and (mode == "kernel" or interpret or jax.default_backend() == "tpu")
    )
    if use_kernel:
        valid = jnp.broadcast_to(jnp.asarray(cache.pos, jnp.int32), (b,))
        col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
        ok = col < valid[:, None]
        if sliding_window is not None:
            # single-token decode: the query sits at absolute position
            # causal_offset; only keys in (pos - W, pos] stay visible
            qpos = jnp.broadcast_to(
                jnp.asarray(causal_offset, jnp.int32), (b,))
            ok = jnp.logical_and(ok, col > qpos[:, None] - sliding_window)
        if attn_mask is not None:
            ok = jnp.logical_and(ok, attn_mask.astype(bool))
        bias = jnp.where(ok, 0.0, da.NEG_INF).astype(jnp.float32)
        if quant:
            out = da.decode_attention(
                q[:, 0], cache.k_q, cache.v_q, bias,
                cache.k_scale, cache.v_scale,
                sm_scale=scale, interpret=interpret)
        else:
            out = da.decode_attention(
                q[:, 0], cache.k, cache.v, bias,
                sm_scale=scale, interpret=interpret)
        return out[:, None]

    return attention(q, *cache.read(), causal_offset=causal_offset,
                     valid_len=cache.pos, scale=scale, attn_mask=attn_mask,
                     sliding_window=sliding_window)


def unembed(x: jax.Array, embedding: jax.Array) -> jax.Array:
    """Tied-embedding logits: (B,S,H) @ (V,H)^T in float32."""
    return jnp.einsum(
        "bsh,vh->bsv", x, embedding.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Shared prefetch-scan decode machinery (per-arch _prefetch_scan_decode
# bodies in models/llama.py, models/opt.py build on these)
# ---------------------------------------------------------------------------


def prefetch_tree_capable(stacked, ctx, caches, s: int,
                          allow_smajor: bool = False) -> bool:
    """Generic gate for the no-copy scalar-prefetch scan decode: single
    token, aligned stacked cache, no taps/TP, and every projection either a
    tile-aligned nibble PackedLinear or a transposed-fp ("weight_t") dict.
    Arch modules add their own shape/attention checks on top.
    allow_smajor: only archs whose scan body dispatches the batched-head
    S-major attention (llama-family) pass True — others decline the
    S-major cache here and take the generic (einsum-fallback) path."""
    from smoothquant_tpu.kernels.pack import PackedLinear

    # NB: KVCache/QuantKVCache are NamedTuples — a plain tuple check would
    # reject every cache; a stacked cache is recognized by its pos field
    if s != 1 or caches is None or not hasattr(caches, "pos"):
        return False
    if isinstance(caches, SMajorQuantKVCache) and not allow_smajor:
        return False
    if ctx is not None and (ctx.taps is not None or ctx.tp_axis is not None
                            or ctx.ep_axis is not None
                            or ctx.attn == "einsum"):
        return False
    if stacked is None or not isinstance(stacked, dict):
        return False
    if caches.pos.ndim not in (1, 2):
        # (L,) aligned or (L, B) per-slot stacked positions; per-slot rides
        # the same scan — the writer kernel takes (B,) positions and
        # validity rides the per-row (B, S) decode bias
        return False
    sa = stacked.get("self_attn", stacked.get("self_attention", {}))
    qp = sa.get("qkv_proj", sa.get("query_key_value", sa.get("q_proj")))
    if isinstance(qp, dict) and "weight_t" in qp:
        # transposed-fp tree: every linear must be weight_t and tileable —
        # the stacked kernel cannot pad loop-invariant weights in-jit
        def _lins(node):
            if isinstance(node, dict) and "weight_t" in node:
                yield node
            elif isinstance(node, dict):
                for v in node.values():
                    yield from _lins(v)

        for lin in _lins(stacked):
            _, k_w, o = lin["weight_t"].shape
            if k_w % 8 or o % 128:
                return False
    elif isinstance(qp, PackedLinear) and qp.meta.nibble:
        if ctx is None or ctx.compute not in ("auto", "int"):
            return False
        # every stacked leaf must be tile-aligned (pack with
        # align_k_groups=8, align_o)
        for leaf in jax.tree.leaves(
                stacked, is_leaf=lambda n: isinstance(n, PackedLinear)):
            if not isinstance(leaf, PackedLinear):
                continue
            m = leaf.meta
            if not m.nibble or (m.k_ns // (2 * m.group_size)) % 8:
                return False
            if leaf.w_qt.shape[-1] % 256:
                return False
    else:
        return False
    return True


def stacked_cache_append(cache, i, k_new, v_new):
    """Write one decode position's K/V into layer i of a STACKED cache at
    its current fill position.  k_new/v_new: (B, 1, H_kv, D) model layout.
    pos may be (L,) aligned or (L, B) per-slot (continuous batching) —
    per-slot rows each land at their own position.  Returns (cache, pos_i)."""
    pos_i = cache.pos[i]
    k_hm = k_new.transpose(0, 2, 1, 3)   # (B, H_kv, 1, D)
    v_hm = v_new.transpose(0, 2, 1, 3)

    def put4(buf, new):
        # buf (L, B, H, S, D), new (B, H, 1, D)
        if pos_i.ndim == 0:
            return jax.lax.dynamic_update_slice(
                buf, new[None].astype(buf.dtype), (i, 0, 0, pos_i, 0))
        layer = jax.lax.dynamic_index_in_dim(buf, i, axis=0, keepdims=False)
        layer = jax.vmap(lambda bl, nl, p: jax.lax.dynamic_update_slice(
            bl, nl.astype(bl.dtype), (0, p, 0)))(layer, new, pos_i)
        return jax.lax.dynamic_update_index_in_dim(buf, layer, i, axis=0)

    def put3(buf, new):
        # buf (L, B, H, S), new (B, H, 1)
        if pos_i.ndim == 0:
            return jax.lax.dynamic_update_slice(
                buf, new[None].astype(buf.dtype), (i, 0, 0, pos_i))
        layer = jax.lax.dynamic_index_in_dim(buf, i, axis=0, keepdims=False)
        layer = jax.vmap(lambda bl, nl, p: jax.lax.dynamic_update_slice(
            bl, nl.astype(bl.dtype), (0, p)))(layer, new, pos_i)
        return jax.lax.dynamic_update_index_in_dim(buf, layer, i, axis=0)

    if isinstance(cache, QuantKVCache):
        kq, ks = QuantKVCache._quantize(k_hm)
        vq, vs = QuantKVCache._quantize(v_hm)
        cache = cache._replace(
            k_q=put4(cache.k_q, kq), v_q=put4(cache.v_q, vq),
            k_scale=put3(cache.k_scale, ks), v_scale=put3(cache.v_scale, vs),
        )
    else:
        cache = cache._replace(
            k=put4(cache.k, k_hm), v=put4(cache.v, v_hm),
        )
    return cache, pos_i


def stacked_cache_append_fused(cache, i, k_new, v_new, cos, sin, ctx,
                               rotate_k: bool = True):
    """stacked_cache_append with the fused Pallas cache writer for INT8
    caches: rotary-k + quantize + in-place row write in ONE kernel call
    (the XLA chain was ~17 us/layer of serialized tiny ops).  k_new/v_new:
    (B, 1, H_kv, D) model layout, k PRE-rotary when rotate_k.  Falls back
    to apply_rotary + stacked_cache_append for fp caches."""
    if isinstance(cache, SMajorQuantKVCache):
        from smoothquant_tpu.kernels.attn_smajor import (
            write_quant_cache_smajor,
        )

        b, s1, h, d = k_new.shape
        if cos is None:
            cos = sin = jnp.zeros((b, 1, d), jnp.float32)
        pos_i = cache.pos[i]
        interp = bool(ctx is not None and ctx.interpret)
        kq, vq, ks, vs = write_quant_cache_smajor(
            i, pos_i, k_new.reshape(b, h, d), v_new.reshape(b, h, d),
            cos, sin, cache.k_q, cache.v_q, cache.k_scale, cache.v_scale,
            rotary=rotate_k, interpret=interp)
        return cache._replace(k_q=kq, v_q=vq, k_scale=ks, v_scale=vs), pos_i
    if isinstance(cache, QuantKVCache):
        from smoothquant_tpu.kernels.cache_write import (
            write_quant_cache_stacked,
        )

        b, s1, h, d = k_new.shape
        if cos is None:  # non-rotary arch: dummy (ignored) tables
            cos = sin = jnp.zeros((b, 1, d), jnp.float32)
        pos_i = cache.pos[i]
        interp = bool(ctx is not None and ctx.interpret)
        kq, vq, ks, vs = write_quant_cache_stacked(
            i, pos_i, k_new.reshape(b, h, d), v_new.reshape(b, h, d),
            cos, sin, cache.k_q, cache.v_q, cache.k_scale, cache.v_scale,
            rotary=rotate_k, interpret=interp)
        return cache._replace(k_q=kq, v_q=vq, k_scale=ks, v_scale=vs), pos_i
    if rotate_k:
        k_new = apply_rotary(k_new, cos, sin)
    return stacked_cache_append(cache, i, k_new, v_new)


def decode_bias(pos_i, b: int, s_max: int, attn_mask,
                sliding_window: Optional[int] = None) -> jax.Array:
    """(B, S_max) additive f32 bias for single-token decode: 0 on valid key
    positions (< pos_i + 1, minus attn_mask holes, minus keys that fell out
    of a sliding window), -inf elsewhere.  pos_i: () aligned or (B,)
    per-slot positions."""
    from smoothquant_tpu.kernels import decode_attention as da

    pos_i = jnp.asarray(pos_i)
    if pos_i.ndim == 1:
        pos_i = pos_i[:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, s_max), 1)
    ok = col < pos_i + 1
    if sliding_window is not None:
        # the query decodes at absolute position pos_i: keys (pos_i - W, pos_i]
        ok = jnp.logical_and(ok, col > pos_i - sliding_window)
    if attn_mask is not None:
        ok = jnp.logical_and(ok, attn_mask.astype(bool))
    return jnp.where(ok, 0.0, da.NEG_INF).astype(jnp.float32)


def stacked_smajor_attention(cache, i, q_bhd, bias, ctx, sm_scale=None):
    """Layer-i decode attention over a stacked S-MAJOR int8 cache via the
    batched-head kernel (kernels/attn_smajor.py).  q_bhd: (B, H, D) POST-
    rotary; returns (B, H, D)."""
    from smoothquant_tpu.kernels.attn_smajor import (
        decode_attention_smajor_stacked,
    )

    idx = jnp.asarray(i, jnp.int32).reshape(1)
    interp = bool(ctx is not None and ctx.interpret)
    return decode_attention_smajor_stacked(
        idx, q_bhd, cache.k_q, cache.v_q, bias,
        cache.k_scale, cache.v_scale,
        sm_scale=sm_scale, interpret=interp)


def stacked_flash_attention(cache, i, q_bhd, bias, ctx, sm_scale=None,
                            alibi_slopes=None):
    """Layer-i decode attention over a stacked (quant or fp) cache via the
    scalar-prefetch flash kernel.  q_bhd: (B, H, D); returns (B, H, D).
    sm_scale=1.0 for archs that pre-scale q (OPT folds 1/sqrt(d) into the
    projection, reference opt.py:63-66).  alibi_slopes: (H,) per-head
    ALiBi slopes (Bloom)."""
    from smoothquant_tpu.kernels import decode_attention as da

    idx = jnp.asarray(i, jnp.int32).reshape(1)
    interp = bool(ctx is not None and ctx.interpret)
    if isinstance(cache, QuantKVCache):
        return da.decode_attention_stacked(
            idx, q_bhd, cache.k_q, cache.v_q, bias,
            cache.k_scale, cache.v_scale, alibi_slopes,
            sm_scale=sm_scale, interpret=interp)
    return da.decode_attention_stacked(
        idx, q_bhd, cache.k, cache.v, bias, None, None, alibi_slopes,
        sm_scale=sm_scale, interpret=interp)
