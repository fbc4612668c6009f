#!/usr/bin/env bash
# Download Copernicus GLO-30 DEM cells via Earth Engine (30m stack;
# counterpart of the reference's util_scripts/download_dem_30m.sh).
set -euo pipefail
python -m terrain_diffusion_tpu.data.downloading.downloader data/dem_30m \
  --dataset copernicus --min-land 0.1 --num-workers "${WORKERS:-8}"
