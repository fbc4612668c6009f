#!/usr/bin/env bash
# Stage-wise FID/KID evaluation suite (counterpart of the reference's
# util_scripts/evaluate.sh): bounded-canvas metrics per model stage plus
# InfiniteDiffusion tiling ablations.
set -euo pipefail
H5=${H5:-data/dataset.h5}
CKPT=${CKPT:-checkpoints/models}
N=${N:-256}

run() { echo "== $*"; python -m "$@"; }

run terrain_diffusion_tpu.evaluation.stage_eval "$CKPT/diffusion_base-192x3" \
  --stage base_diffusion --h5-file "$H5" --n-images "$N"
run terrain_diffusion_tpu.evaluation.stage_eval "$CKPT/consistency_base-192x3" \
  --stage base_consistency --h5-file "$H5" --n-images "$N"
run terrain_diffusion_tpu.evaluation.stage_eval "$CKPT/consistency_decoder-64x3" \
  --stage decoder_consistency --h5-file "$H5" --n-images "$N"
run terrain_diffusion_tpu.evaluation.stage_eval "$CKPT/consistency_decoder-64x3" \
  --stage decoder_consistency --h5-file "$H5" --n-images "$N" --disable-laplacian-denoising

# InfiniteDiffusion ablations: full blending vs constant windows vs naive tiling
for MODE in blend constant naive skip-edge; do
  run terrain_diffusion_tpu.evaluation.infinite_consistency \
    "$CKPT/consistency_base-192x3" "$CKPT/consistency_decoder-64x3" \
    --h5-file "$H5" --n-images "$N" --mode "$MODE"
done
