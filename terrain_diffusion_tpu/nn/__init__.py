from terrain_diffusion_tpu.nn.edm_unet import EDMUnetConfig, EDMUnet2D  # noqa: F401
from terrain_diffusion_tpu.nn.edm_autoencoder import (  # noqa: F401
    EDMAutoencoderConfig,
    EDMAutoencoder,
)
