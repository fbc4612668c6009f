#!/usr/bin/env bash
# Build the 90m base dataset from downloaded MERIT cells + ETOPO + WorldClim
# (counterpart of the reference's util_scripts/create_base_dataset.sh).
set -euo pipefail
python -m terrain_diffusion_tpu build-base-dataset data/dataset.h5 \
  --highres-folder data/dem_90m \
  --lowres-file data/global/etopo_10m.tif \
  --climate-folder data/global \
  --resolution 90 --num-workers "${WORKERS:-8}"
python -m terrain_diffusion_tpu define-splits data/dataset.h5 --splits-csv data/splits.csv
python -m terrain_diffusion_tpu.data.preprocessing.beauty_score data/dataset.h5
