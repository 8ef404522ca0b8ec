"""Real-INT8 OPT export — examples/export_int8_model.py equivalent.

Pipeline (export_int8_model.py:16-56): load FP OPT → smooth (α=0.5) →
collect static per-tensor scales → build the int8 model → save.  The saved
artifact is an .npz of int8 weights + scales + fp embeddings, loadable by
smoothquant_tpu.models.opt_int8 (checkpoint format in utils/checkpoint.py).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True, help=".npz")
    p.add_argument("--act_scales_path", type=str, default=None)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--num_samples", type=int, default=512)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--no_smooth", action="store_true")
    p.add_argument("--export_smoothed", action="store_true",
                   help="instead of the int8 model, save the smoothed FP "
                        "params + raw per-layer scales (the reference's "
                        "--export-FT FasterTransformer path, "
                        "export_int8_model.py:45-53)")
    p.add_argument("--tokens_path", type=str, default=None)
    p.add_argument("--dataset_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from smoothquant_tpu.cli.common import calib_batches, forward_fn, load_token_stream
    from smoothquant_tpu.models import opt_int8
    from smoothquant_tpu.models.registry import smooth_lm
    from smoothquant_tpu.quant.calibrate import (
        get_act_scales,
        get_static_act_dict,
        get_static_decoder_layer_scales_opt,
    )
    from smoothquant_tpu.utils.checkpoint import save_int8_opt
    from smoothquant_tpu.utils.hf_import import load_act_scales, load_model

    arch, cfg, params = load_model(args.model_path, dtype="float32")
    if arch != "opt":
        raise SystemExit(f"int8 export supports OPT only (got {arch})")
    tokens = load_token_stream(args)
    batches = calib_batches(tokens, args.num_samples, args.seq_len)
    _, tapped = forward_fn(arch, cfg)

    if not args.no_smooth:
        if args.act_scales_path:
            scales = load_act_scales(args.act_scales_path)
        else:
            scales = get_act_scales(tapped, params, batches)
        params = smooth_lm(arch, params, cfg, scales, args.alpha)

    act_dict = get_static_act_dict(tapped, params, batches)
    layer_scales = get_static_decoder_layer_scales_opt(act_dict, cfg.num_hidden_layers)
    if args.export_smoothed:
        import json

        from smoothquant_tpu.utils.checkpoint import save_params

        save_params(params, args.output_path)
        scales_path = args.output_path.replace(".npz", "") + ".layer_scales.json"
        with open(scales_path, "w") as f:
            json.dump(layer_scales, f, indent=2)
        print(f"saved smoothed FP params to {args.output_path} "
              f"+ raw scales to {scales_path}")
    else:
        int8_params = opt_int8.from_float(params, cfg, layer_scales)
        save_int8_opt(int8_params, cfg, args.output_path)
        print(f"saved INT8 OPT model to {args.output_path}")


if __name__ == "__main__":
    main()
