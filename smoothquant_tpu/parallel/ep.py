"""Expert parallelism (EP) for MoE models — experts sharded over a mesh axis.

The reference computes MoE only through HF's GPU routing and its own dense
simulation (fake_quant.py:564-668); it has no multi-device story at all
(SURVEY.md §2.9).  Here the experts of every layer are stacked on a leading
E axis (mixtral.stack_experts) and sharded P("ep", ...) under shard_map:

  * the router runs replicated (its output is E logits — no shardable work),
  * each device gathers the capacity-bounded token buffers for its OWN
    E/ep experts (models.mixtral._moe_block_sparse with ctx.ep_axis),
  * per-device partial MoE outputs are psum-combined — ONE all-reduce per
    MoE block, no all-to-all, which is the right trade at decode batch
    sizes where activations are KBs and expert weights are GBs.

Capacity, routing, and drop decisions are computed from GLOBAL assignment
order on every device, so EP output is bit-comparable (up to psum ordering)
to single-device sparse dispatch.
"""

from __future__ import annotations

import functools

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from smoothquant_tpu.kernels.pack import PackedLinear
from smoothquant_tpu.models.common import ForwardContext

EP_AXIS = "ep"


def make_ep_mesh(ep: int | None = None, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    ep = ep or len(devices)
    return Mesh(np.array(devices[:ep]), (EP_AXIS,))


def _leaf_spec(a, stacked: bool):
    if stacked:
        return P(*([EP_AXIS] + [None] * (a.ndim - 1)))
    return P(*([None] * a.ndim))


def ep_specs(params: dict) -> dict:
    """PartitionSpec pytree: leaves under an experts/"stacked" subtree are
    sharded on their leading (expert) axis; everything else replicated."""

    def walk(node, stacked=False):
        if isinstance(node, PackedLinear):
            return PackedLinear(
                w_qt=_leaf_spec(node.w_qt, stacked),
                w_scales_t=_leaf_spec(node.w_scales_t, stacked),
                w_sal_t=_leaf_spec(node.w_sal_t, stacked),
                bias=None if node.bias is None else _leaf_spec(node.bias, stacked),
                perm=_leaf_spec(node.perm, stacked),
                meta=node.meta,
            )
        if isinstance(node, dict):
            return {k: walk(v, stacked or k == "stacked")
                    for k, v in node.items()}
        if node is None:
            return None
        return _leaf_spec(node, stacked)

    return walk(params)


def make_ep_forward(mod, cfg, mesh: Mesh, *, compute: str = "auto",
                    interpret: bool = False, capacity_factor: float = 2.0):
    """Build a jitted expert-parallel forward for a stack_experts() pytree.

    Returns build(params) -> fwd(params, input_ids) -> logits.
    """
    ep = mesh.shape[EP_AXIS]
    if cfg.num_local_experts % ep:
        raise ValueError(
            f"num_local_experts {cfg.num_local_experts} not divisible by "
            f"ep={ep}")

    def build(params):
        specs = ep_specs(params)
        ctx = ForwardContext(compute=compute, interpret=interpret,
                             moe_dispatch="sparse",
                             moe_capacity_factor=capacity_factor,
                             ep_axis=EP_AXIS)

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
