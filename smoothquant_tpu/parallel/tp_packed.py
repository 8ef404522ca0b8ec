"""Tensor parallelism for the PACKED (real-kernel) execution path.

Design: every quantizable linear is column-parallel — its int4/int8 weight
block, group scales, salient block and bias are sharded on the OUTPUT axis
across the `tp` mesh axis; each device runs the Pallas kernel on its shard
and the outputs are all-gathered (ForwardContext.tp_axis in call_linear).
Inputs (and therefore channel permutations, salient metadata and activation
quantization) stay replicated, so groups never straddle shards and numerics
are identical to single-chip.

At decode the gathered activations are KBs — the collective cost is noise
against the weight reads this scheme splits tp-ways.  (A Megatron-style
row-parallel + psum variant saves one gather per block at prefill; that is
a later optimization, not a capability gap.)

Works for every registered architecture because the sharding is defined at
the PackedLinear level, not per-model.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from smoothquant_tpu.kernels.pack import PackedLinear
from smoothquant_tpu.models.common import ForwardContext
from smoothquant_tpu.parallel.mesh import TP_AXIS


def _packed_specs(p: PackedLinear) -> PackedLinear:
    """PartitionSpec pytree matching a PackedLinear (O-axis sharded)."""
    return PackedLinear(
        w_qt=P(None, TP_AXIS),
        w_scales_t=P(None, TP_AXIS),
        w_sal_t=P(None, TP_AXIS),
        bias=None if p.bias is None else P(TP_AXIS),
        perm=P(None),
        meta=p.meta,
    )


def packed_model_specs(params):
    """Spec pytree for a packed params tree: PackedLinears O-sharded,
    everything else replicated."""
    def spec_of(node):
        if isinstance(node, PackedLinear):
            return _packed_specs(node)
        if isinstance(node, dict):
            return {k: spec_of(v) for k, v in node.items()}
        if node is None:
            return None
        return P(*([None] * node.ndim))

    return spec_of(params)


def assert_tp_divisible(params, tp: int) -> None:
    def walk(node):
        if isinstance(node, PackedLinear):
            o = node.meta.out_features
            if o % tp:
                raise ValueError(
                    f"out_features {o} not divisible by tp={tp}")
        elif isinstance(node, dict):
            for v in node.values():
                walk(v)

    walk(params)


def make_tp_forward(mod, cfg, qcfg, mesh, *, compute: str = "auto",
                    interpret: bool = False):
    """Build a jitted tensor-parallel forward for a packed model.

    Returns forward_tp(params, input_ids) -> logits, running under shard_map
    over `mesh`'s tp axis.  params must be the GLOBAL packed pytree (shard_map
    splits it per packed_model_specs).
    """
    tp = mesh.shape[TP_AXIS]

    def build(params):
        assert_tp_divisible(params, tp)
        specs = packed_model_specs(params)
        ctx = ForwardContext(quant=qcfg, compute=compute, interpret=interpret,
                             tp_axis=TP_AXIS)

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(specs, P(None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
        def fwd(local_params, ids):
            logits, _ = mod.forward(local_params, ids, cfg, ctx=ctx)
            return logits

        return fwd

    return build
