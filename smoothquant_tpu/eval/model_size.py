"""Analytic model-size accounting (model_size.py:5-16 in the reference).

size_bits = numel × [(1-p)·(w + 20/g) + p·(16 + 20/g)]
where w = data width (bits), p = salient proportion, g = group size (the
20/g term is 16-bit scale + 4-bit metadata per group; omitted when g == -1).
"""

from __future__ import annotations

import jax

GiB = 2 ** 30
MiB = 2 ** 20


def count_params(params) -> int:
    leaves = [x for x in jax.tree.leaves(params) if hasattr(x, "size")]
    return int(sum(x.size for x in leaves))


def get_model_size_bits(
    num_elements: int, data_width: int = 16, salient_prop: float = 0.0,
    group_size: int = -1,
) -> float:
    w_ns = float(data_width)
    w_s = 16.0
    if group_size != -1:
        overhead = (16 + 4) / group_size
        w_ns += overhead
        w_s += overhead
    avg = w_ns * (1 - salient_prop) + w_s * salient_prop
    return num_elements * avg


def get_model_size(
    params, data_width: int = 16, salient_prop: float = 0.0, group_size: int = -1
) -> float:
    """Size in bits for a params pytree (counts every array leaf)."""
    return get_model_size_bits(count_params(params), data_width, salient_prop, group_size)


def bits_to_mib(bits: float) -> float:
    return bits / 8 / MiB
