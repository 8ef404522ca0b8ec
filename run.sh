#!/usr/bin/env bash
# Flagship sweep entry point — the reference run.sh equivalent (run.sh:1-4).
# Requires local HF checkpoints + a pre-tokenized WikiText-2 stream (.npy);
# nothing is downloaded.
set -euo pipefail

MODEL=${1:-/ckpts/opt-1.3b}
TOKENS=${2:-wikitext2_test_tokens.npy}
CALIB=${3:-wikitext2_valid_tokens.npy}

python -m smoothquant_tpu.cli.run_experiments \
  --model_path "$MODEL" \
  --tokens_path "$TOKENS" \
  --calib_tokens_path "$CALIB" \
  --group_sizes 4 8 16 32 64 128 256 \
  --salient_props 0.0 0.01 0.05 0.1 \
  --plots
