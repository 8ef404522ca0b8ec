"""HF checkpoint import: local directory (config.json + safetensors/bin) →
our model config + params pytree.

Replaces the reference's reliance on transformers.from_pretrained
(ppl_eval.py:69-71) for the model graph — we only consume the *weights*;
the architecture is ours.  Works fully offline from a local path.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "mistral",
    "OPTForCausalLM": "opt",
    "MixtralForCausalLM": "mixtral",
    "FalconForCausalLM": "falcon",
    "BloomForCausalLM": "bloom",
}


def detect_arch(model_path: str) -> str:
    with open(os.path.join(model_path, "config.json")) as f:
        cfg = json.load(f)
    archs = cfg.get("architectures") or []
    for a in archs:
        if a in ARCH_MAP:
            return ARCH_MAP[a]
    mt = cfg.get("model_type", "")
    if mt in ("llama", "mistral", "opt", "mixtral", "falcon", "bloom"):
        return mt
    raise ValueError(f"cannot detect architecture from {model_path}: {archs or mt}")


def load_state_dict(model_path: str) -> dict:
    """Load all weights from safetensors shards (preferred) or torch .bin."""
    state: dict = {}
    st_files = sorted(
        f for f in os.listdir(model_path) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            state.update(load_file(os.path.join(model_path, f)))
        return state

    bin_files = sorted(
        f for f in os.listdir(model_path)
        if f.endswith(".bin") and f.startswith("pytorch_model")
    )
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(os.path.join(model_path, f), map_location="cpu",
                            weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
        return state
    raise FileNotFoundError(f"no safetensors or pytorch_model*.bin in {model_path}")


def load_model(model_path: str, dtype: Optional[str] = None):
    """Returns (arch, cfg, params) for a local HF checkpoint directory."""
    from transformers import AutoConfig

    arch = detect_arch(model_path)
    hf_cfg = AutoConfig.from_pretrained(model_path)
    state = load_state_dict(model_path)

    from smoothquant_tpu.models.registry import get_arch

    mod = get_arch(arch)
    cfg = mod.config_from_hf(hf_cfg)
    params = mod.params_from_hf_state_dict(state, cfg, dtype=dtype)
    return arch, cfg, params


def load_act_scales(path: str) -> dict:
    """Load an activation-scales artifact.

    Accepts the reference's torch.save format (act_scales/<model>.pt,
    generate_act_scales.py:61) or our .npz format.  Returns
    {hf_module_name: float32 (C,) numpy array}.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.float()) for k, v in obj.items()}


def save_act_scales(scales: dict, path: str) -> None:
    if path.endswith(".npz"):
        np.savez(path, **{k: np.asarray(v, np.float32) for k, v in scales.items()})
    else:
        import torch

        torch.save({k: torch.tensor(np.asarray(v)) for k, v in scales.items()}, path)
