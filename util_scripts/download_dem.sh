#!/usr/bin/env bash
# Download MERIT 90m DEM cells via Earth Engine (requires earthengine-api auth).
set -euo pipefail
python -m terrain_diffusion_tpu.data.downloading.downloader data/dem_90m \
  --dataset merit --min-land 0.001 --num-workers "${WORKERS:-8}"
