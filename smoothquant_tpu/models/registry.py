"""Model registry — architecture dispatch for quantization and smoothing.

The TPU equivalent of the quantize_model isinstance-dispatcher
(fake_quant.py:734-799) and smooth_lm's per-architecture walk
(smooth.py:74-160), keyed by architecture name instead of HF classes.
"""

from __future__ import annotations

from typing import Optional

from smoothquant_tpu.models import bloom, falcon, llama, mixtral, opt
from smoothquant_tpu.quant.config import QuantConfig
from smoothquant_tpu.quant.smooth import smooth_model as _smooth_model

_ARCHES = {}


def register_arch(name, module):
    _ARCHES[name] = module


register_arch("llama", llama)
register_arch("mistral", llama)  # llama-like (fake_quant.py:765)
register_arch("opt", opt)
register_arch("mixtral", mixtral)
register_arch("falcon", falcon)
register_arch("bloom", bloom)  # smoothing in reference; quant is our extension


def get_arch(name: str):
    try:
        return _ARCHES[name]
    except KeyError:
        raise ValueError(
            f"Unsupported model architecture: {name!r} (supported: {sorted(_ARCHES)})"
        ) from None


def quantize_model(
    arch: str,
    params: dict,
    cfg,
    qcfg: QuantConfig,
    input_feat: Optional[dict] = None,
) -> dict:
    """Offline weight quantization for any registered architecture."""
    return get_arch(arch).quantize_params(params, cfg, qcfg, input_feat)


def smooth_lm(arch: str, params: dict, cfg, act_scales: dict, alpha: float = 0.5) -> dict:
    """Apply SmoothQuant smoothing for any registered architecture."""
    m = get_arch(arch)
    return _smooth_model(params, m.smoothing_map(cfg), act_scales, alpha)


def pack_model(
    arch: str,
    params: dict,
    cfg,
    qcfg: QuantConfig,
    input_feat: Optional[dict] = None,
    act_scales: Optional[dict] = None,
    compute_dtype=None,
    nibble: bool = False,
    lm_head_qcfg: Optional[QuantConfig] = None,
    host_pack: bool = False,
    align_k_groups: int = 1,
    align_o: int = 1,
    fuse: bool = False,
    fold_perms: bool = False,
    shared_residual_basis: bool = False,
    identity_keys: tuple = (),
) -> dict:
    """Replace every quantizable linear with a PackedLinear (real-kernel path).

    input_feat: salience importance vectors (calibrated mean-abs, summed);
    act_scales: per-channel absmax (also the smoothing artifact) — used as
    the static sort key for group layouts.  Both keyed by HF module names.
    nibble: store weights 4-bit two-per-byte (decode-optimal, int path only).
    lm_head_qcfg: when set and the model has an untied lm_head, also pack it
    with this (typically W8A8 per-channel) recipe — the reference leaves the
    lm_head fp16, which at decode re-reads V×H bf16 bytes every step and
    caps the achievable speedup.
    host_pack: quantize + nibble-pack on the host (native OpenMP lib) before
    device transfer — cold-start checkpoint ingestion moves ~4-8 bits per
    weight element host→device instead of 16 and compiles nothing.
    identity_keys: substrings of module names (e.g. "o_proj") to pack in
    the IDENTITY nibble layout — original channel order, unsorted groups,
    scattered salient channels masked out of the int path and gathered
    (k_s-wide) onto the fp side path.  Removes the full-width runtime
    activation gather at call sites whose input cannot be pre-permuted
    (o_proj: attention output); grouping quality matches the reference's
    UNSORTED ablation, which is benign at small group sizes.
    """
    import jax.numpy as jnp
    import numpy as np

    from smoothquant_tpu.kernels.pack import pack_linear
    from smoothquant_tpu.quant.smooth import _get_path, _set_path

    mod = get_arch(arch)
    compute_dtype = compute_dtype or jnp.dtype(getattr(cfg, "dtype", "bfloat16"))
    if fuse:
        # qkv / gate-up fusion: halves decode kernel launches; calibration
        # stats are shared (same input) so packing is equivalent (tested)
        if not hasattr(mod, "fuse_projections"):
            raise NotImplementedError(f"{arch} has no fused-projection support")
        params = mod.fuse_projections(params, cfg)
        listing = mod.quantizable_linears_fused(cfg)
    else:
        listing = mod.quantizable_linears(cfg)
    rs_paths: dict = {}
    shared_imp = shared_absmax = None
    if shared_residual_basis:
        # ONE channel permutation for the residual stream, shared by every
        # layer's qkv/gate_up input: pack those consumers with SHARED stats
        # (summed importance, max'd absmax — deterministic ⇒ identical perm),
        # mark them pre_permuted, and fold the basis into the embedding,
        # norms, and o/down output columns (apply_shared_residual_basis).
        # Zero runtime activation gathers for the stream; the quantization
        # grouping uses the shared key instead of per-layer keys (a recipe
        # knob — per-layer sorted grouping remains the default path).
        if not hasattr(mod, "residual_consumers"):
            raise NotImplementedError(
                f"{arch} has no shared-residual-basis support")
        rs_paths = {tuple(p): key
                    for p, key in mod.residual_consumers(cfg, fuse)}
        keys = set(rs_paths.values())
        if input_feat is not None:
            shared_imp = np.sum([np.asarray(input_feat[k]) for k in keys],
                                axis=0)
        if act_scales is not None:
            shared_absmax = np.max([np.asarray(act_scales[k]) for k in keys],
                                   axis=0)
        elif shared_imp is not None:
            shared_absmax = shared_imp  # deterministic shared sort key
        else:
            raise ValueError("shared_residual_basis needs input_feat or "
                             "act_scales to define the shared layout")

    fold_map = {}
    if fold_perms:
        # fold consumers' input perms into their producers' output rows
        # (kernels.pack.fold_input_perm) — consumers must pack FIRST so the
        # producer's FP weight can still be relaid before its own packing
        if not hasattr(mod, "perm_fold_pairs"):
            raise NotImplementedError(f"{arch} has no perm-fold support")
        fold_map = {tuple(c): prods
                    for c, prods in mod.perm_fold_pairs(cfg, fuse)}
        listing = sorted(
            listing, key=lambda t: 0 if tuple(t[0]) in fold_map else 1)
    from smoothquant_tpu.kernels.pack import fold_input_perm

    import dataclasses as _dc

    shared_perm = None
    for path, key, _qo in listing:
        lin = _get_path(params, path)
        imp = None if input_feat is None else np.asarray(input_feat[key])
        absmax = None if act_scales is None else np.asarray(act_scales[key])
        if tuple(path) in rs_paths:
            imp = shared_imp if shared_imp is not None else imp
            absmax = shared_absmax
        identity = nibble and any(sub in key for sub in identity_keys)
        packed = pack_linear(lin, qcfg, importance=imp, act_absmax=absmax,
                             compute_dtype=compute_dtype, nibble=nibble,
                             host_pack=host_pack, identity=identity,
                             align_k_groups=align_k_groups, align_o=align_o)
        if tuple(path) in rs_paths:
            packed = _dc.replace(
                packed, meta=_dc.replace(packed.meta, pre_permuted=True))
            if shared_perm is None:
                shared_perm = np.asarray(packed.perm)
            else:
                assert np.array_equal(shared_perm, np.asarray(packed.perm)), \
                    "shared-basis consumers diverged in layout"
        for prod_path, n_splits in fold_map.get(tuple(path), ()):
            prod_lin = _get_path(params, prod_path)
            packed, prod_lin = fold_input_perm(packed, prod_lin, n_splits)
            params = _set_path(params, prod_path, prod_lin)
        params = _set_path(params, path, packed)
    if lm_head_qcfg is not None and isinstance(params.get("lm_head"), dict):
        params = dict(params)
        lm = params["lm_head"]
        if shared_perm is not None:
            # the lm_head input arrives in the shared basis: fold the
            # inverse into its weight columns before packing
            lm = {"weight": jnp.take(jnp.asarray(lm["weight"]),
                                     jnp.asarray(shared_perm), axis=1),
                  "bias": lm.get("bias")}
        params["lm_head"] = pack_linear(lm, lm_head_qcfg,
                                        compute_dtype=compute_dtype,
                                        host_pack=host_pack)
    if shared_perm is not None:
        params = mod.apply_shared_residual_basis(params, cfg, shared_perm)
    return params
