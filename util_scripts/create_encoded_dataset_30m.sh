#!/usr/bin/env bash
# Encode 30m dataset residuals with the trained VAE (8-fold D4 pre-aug;
# counterpart of util_scripts/create_encoded_dataset_30m.sh).
set -euo pipefail
python -m terrain_diffusion_tpu build-encoded-dataset data/dataset_30m.h5 \
  "${AE_MODEL:-checkpoints/autoencoder_x8/latest_checkpoint/saved_model_ema}" \
  --resolution 30 --residual-mean 0.0 --residual-std 0.7
