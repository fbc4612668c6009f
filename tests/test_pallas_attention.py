"""Fused Pallas attention vs XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.ops import pallas_attention as pa


@pytest.mark.parametrize("shape,heads", [((2, 8, 8, 64), 1), ((1, 16, 16, 128), 2)])
def test_fused_matches_reference(shape, heads, rng):
    if not pa._PALLAS_OK:
        pytest.skip("pallas unavailable")
    qkv = jnp.asarray(rng.standard_normal((*shape[:3], shape[3] * 3)),
                      jnp.float32)
    want = np.asarray(pa.reference_pixelnorm_attention(qkv, heads))

    # interpret mode so the kernel logic is testable on the CPU mesh
    import functools

    from jax.experimental import pallas as pl

    n, h, w, c3 = qkv.shape
    c = c3 // 3
    ch = c // heads
    hw = h * w
    # conv channel layout is (head, channel, qkv), qkv fastest (see
    # layers._attention / reference unet_block.py:103)
    y = qkv.reshape(n, hw, heads, ch, 3)
    y = jnp.transpose(y, (0, 2, 4, 3, 1)).reshape(n * heads, 3 * ch, hw)
    out = pl.pallas_call(
        functools.partial(pa._attn_kernel, ch=ch, hw=hw, eps=1e-4),
        out_shape=jax.ShapeDtypeStruct((n * heads, ch, hw), qkv.dtype),
        grid=(n * heads,),
        in_specs=[pl.BlockSpec((1, 3 * ch, hw), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, ch, hw), lambda i: (i, 0, 0)),
        interpret=True,
    )(y)
    out = out.reshape(n, heads, ch, hw)
    got = np.asarray(jnp.transpose(out, (0, 3, 1, 2)).reshape(n, h, w, c))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
