#!/usr/bin/env bash
# Encode dataset residuals with the trained VAE (8-fold D4 pre-augmentation).
set -euo pipefail
python -m terrain_diffusion_tpu build-encoded-dataset data/dataset.h5 \
  "${AE_MODEL:-checkpoints/autoencoder_x8/latest_checkpoint/saved_model_ema}"
