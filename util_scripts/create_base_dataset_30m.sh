#!/usr/bin/env bash
# Build the 30m base dataset from downloaded Copernicus cells + ETOPO +
# WorldClim (counterpart of util_scripts/create_base_dataset_30m.sh).
set -euo pipefail
python -m terrain_diffusion_tpu build-base-dataset data/dataset_30m.h5 \
  --highres-folder data/dem_30m \
  --lowres-file data/global/etopo_10m.tif \
  --climate-folder data/global \
  --resolution 30 \
  --highres-size 2048 --lowres-size 256 --lowres-sigma 5 \
  --num-chunks 1 --edge-margin 5 --ocean-keep-pct 0.1 \
  --data-source copernicus --num-workers "${WORKERS:-8}"
python -m terrain_diffusion_tpu define-splits data/dataset_30m.h5 --splits-csv data/splits_30m.csv
python -m terrain_diffusion_tpu.data.preprocessing.beauty_score data/dataset_30m.h5
