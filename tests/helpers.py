"""Shared test helpers: tiny production-shaped models for pipeline tests."""
import jax

from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig


def tiny_models(key=None, decoder_tile=128):
    """(coarse, base, decoder) (model, params) pairs with production channel
    interfaces but tiny widths."""
    key = key or jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)
    coarse = EDMUnet2D(EDMUnetConfig(
        image_size=16, in_channels=11, out_channels=6, model_channels=8,
        model_channel_mults=(1,), layers_per_block=1, attn_resolutions=(),
        midblock_attention=False, concat_balance=0.5,
        conditional_inputs=tuple(("float", 8, 0.2) for _ in range(5)),
        fourier_scale="pos", noise_emb_dims=8, logvar_channels=8))
    base = EDMUnet2D(EDMUnetConfig(
        image_size=64, in_channels=5, out_channels=5, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1, attn_resolutions=(),
        midblock_attention=False, concat_balance=0.5,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos",
        noise_emb_dims=8, logvar_channels=8))
    decoder = EDMUnet2D(EDMUnetConfig(
        image_size=decoder_tile, in_channels=5, out_channels=1, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1, attn_resolutions=(),
        midblock_attention=False, concat_balance=0.5, conditional_inputs=(),
        fourier_scale="pos", noise_emb_dims=8, logvar_channels=8))
    return ((coarse, coarse.init(k1)), (base, base.init(k2)),
            (decoder, decoder.init(k3)))
