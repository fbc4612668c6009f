"""Model stack tests: shapes, magnitude preservation, determinism,
torch-naming weight round-trip, and production-config instantiation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from terrain_diffusion_tpu.nn import (
    EDMUnet2D,
    EDMUnetConfig,
    EDMAutoencoder,
    EDMAutoencoderConfig,
)
from terrain_diffusion_tpu.nn import torch_compat as tc
from terrain_diffusion_tpu.nn.layers import norm_weights_tree


SMALL = EDMUnetConfig(
    image_size=16,
    in_channels=5,
    out_channels=3,
    model_channels=16,
    model_channel_mults=(1, 2),
    layers_per_block=1,
    attn_resolutions=(8,),
    midblock_attention=True,
    conditional_inputs=(("float", 8, 0.2), ("tensor", 7, 0.3)),
    fourier_scale="pos",
    block_kwargs={"channels_per_head": 16},
)


@pytest.fixture(scope="module")
def small_model():
    model = EDMUnet2D(SMALL)
    params = model.init(jax.random.key(0))
    return model, params


def test_forward_shapes_and_determinism(small_model):
    model, params = small_model
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 5))
    nl = jnp.asarray([0.5, 1.0])
    cond = [jnp.asarray([0.1, 0.2]), jax.random.normal(jax.random.key(2), (2, 7))]
    out = model.apply(params, x, nl, cond)
    assert out.shape == (2, 16, 16, 3)
    out2 = model.apply(params, x, nl, cond)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_logvar_head(small_model):
    model, params = small_model
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 5))
    nl = jnp.asarray([0.5, 1.0])
    cond = [jnp.asarray([0.1, 0.2]), jax.random.normal(jax.random.key(2), (2, 7))]
    out, logvar = model.apply(params, x, nl, cond, return_logvar=True)
    assert logvar.shape == (2, 1, 1, 1)
    assert np.isfinite(np.asarray(logvar)).all()


def test_magnitude_preservation():
    """Normalized-weight U-Net should keep activation magnitudes near unit
    scale for unit-scale inputs (the point of MP design)."""
    cfg = EDMUnetConfig(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        model_channel_mults=(1, 2), layers_per_block=2)
    model = EDMUnet2D(cfg)
    params = norm_weights_tree(model.init(jax.random.key(0)))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 4))
    out = model.apply(params, x, jnp.asarray([0.3, 0.7]), [])
    # out_gain starts at 0 => output ~0; check internal magnitudes via logvar
    assert float(jnp.abs(out).max()) < 1e-3
    # with out_gain = 1, output should be O(1)
    params2 = dict(params)
    params2["out_gain"] = jnp.ones(())
    out2 = model.apply(params2, x, jnp.asarray([0.3, 0.7]), [])
    s = float(jnp.std(out2))
    assert 0.1 < s < 10.0


def test_jit_and_grad():
    cfg = EDMUnetConfig(image_size=8, in_channels=2, model_channels=8,
                        model_channel_mults=(1,), layers_per_block=1)
    model = EDMUnet2D(cfg)
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 2))

    target = jax.random.normal(jax.random.key(2), (1, 8, 8, 2))

    @jax.jit
    def loss(p):
        out = model.apply(p, x, jnp.asarray([0.5]), [])
        return jnp.mean((out - target) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # gradient reaches conv weights through the forced normalization
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


def test_torch_roundtrip(small_model):
    model, params = small_model
    state = tc.params_to_torch_state(model, params)
    # torch conv layout check
    w = state["enc.16x16_conv.weight"]
    assert w.shape == (16, 6, 3, 3)  # (O, I=in+ones, kh, kw)
    params2 = tc.params_from_torch_state(model, state)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 5))
    nl = jnp.asarray([0.5])
    cond = [jnp.asarray([0.1]), jax.random.normal(jax.random.key(2), (1, 7))]
    a = np.asarray(model.apply(params, x, nl, cond))
    b = np.asarray(model.apply(params2, x, nl, cond))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_save_load_model_dir(tmp_path, small_model):
    model, params = small_model
    tc.save_model(model, params, str(tmp_path / "m"))
    model2, params2 = tc.load_model(str(tmp_path / "m"))
    assert model2.config == model.config
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 5))
    nl = jnp.asarray([0.5])
    cond = [jnp.asarray([0.1]), jax.random.normal(jax.random.key(2), (1, 7))]
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x, nl, cond)),
        np.asarray(model2.apply(params2, x, nl, cond)), rtol=1e-6, atol=1e-6)


def test_production_configs_instantiate():
    """The three production model shapes (BASELINE/SURVEY configs) build and
    run on tiny batches."""
    coarse = EDMUnet2D(EDMUnetConfig(
        image_size=16, in_channels=11, out_channels=6, model_channels=32,
        model_channel_mults=(1,), layers_per_block=2,
        attn_resolutions=(), midblock_attention=False, concat_balance=0.5,
        conditional_inputs=tuple(("float", 64, 0.2) for _ in range(5)),
        fourier_scale="pos"))
    p = coarse.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 11))
    out = coarse.apply(p, x, jnp.asarray([0.5]), [jnp.asarray([0.1])] * 5)
    assert out.shape == (1, 64, 64, 6)

    base = EDMUnet2D(EDMUnetConfig(
        image_size=512, in_channels=5, out_channels=5, model_channels=32,
        model_channel_mults=(1, 2, 3, 4), layers_per_block=1,
        attn_resolutions=(8, 16), midblock_attention=True, concat_balance=0.5,
        conditional_inputs=(("tensor", 58, 1.0),), fourier_scale="pos"))
    p = base.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 5))
    out = base.apply(p, x, jnp.asarray([0.5]),
                     [jax.random.normal(jax.random.key(2), (1, 58))])
    assert out.shape == (1, 64, 64, 5)


def test_autoencoder_roundtrip_shapes():
    cfg = EDMAutoencoderConfig(
        image_size=64, in_channels=1, latent_channels=4, model_channels=16,
        model_channel_mults=(1, 2, 4), layers_per_block=1,
        attn_resolutions=(), midblock_attention=False, direct_skips=())
    ae = EDMAutoencoder(cfg)
    params = ae.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 1))
    means, logvars = ae.preencode(params, x)
    assert means.shape == (1, 16, 16, 4)  # /4 spatial (3 levels)
    z = ae.postencode(means, logvars, key=jax.random.key(2))
    out = ae.decode(params, z)
    assert out.shape == (1, 64, 64, 1)
    out_lv, lv = ae.decode(params, z, include_logvar=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_lv))


def test_autoencoder_direct_skips():
    cfg = EDMAutoencoderConfig(
        image_size=32, in_channels=2, latent_channels=2, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1, midblock_attention=False,
        direct_skips=(1,))
    ae = EDMAutoencoder(cfg)
    params = ae.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 2))
    means, logvars = ae.preencode(params, x)
    assert means.shape[-1] == 3  # 2 latent + 1 skip
    assert float(np.asarray(logvars[..., -1]).max()) == -20.0
    out = ae.decode(params, means)
    # direct-skip channel is the nearest-upsampled avg-pool of input channel 1
    from terrain_diffusion_tpu.ops.image import avg_pool, upsample_nearest
    pooled = avg_pool(jnp.moveaxis(x[..., 1:2], -1, 1), 2)
    want = jnp.moveaxis(upsample_nearest(pooled, 2), 1, -1)[..., 0]
    np.testing.assert_allclose(np.asarray(out[..., 1]), np.asarray(want), rtol=1e-5)


def test_autoencoder_torch_roundtrip():
    cfg = EDMAutoencoderConfig(
        image_size=32, in_channels=1, latent_channels=2, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1, midblock_attention=False)
    ae = EDMAutoencoder(cfg)
    params = ae.init(jax.random.key(0))
    state = tc.params_to_torch_state(ae, params)
    params2 = tc.params_from_torch_state(ae, state)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 1))
    a, _ = ae.preencode(params, x)
    b, _ = ae.preencode(params2, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_conv_resample_block():
    """resample_type='conv' (MPConvResample) up/down blocks run and keep
    magnitudes sane."""
    from terrain_diffusion_tpu.nn import layers as L

    key = jax.random.key(0)
    for mode, factor in (("down", 0.5), ("up", 2)):
        p = L.unet_block_init(key, 16, 16, 0, mode="enc" if mode == "down" else "dec",
                              resample_mode=mode, resample_type="conv",
                              resample_filter=2)
        assert "resample" in p
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 16))
        out = L.unet_block_apply(p, x, None, mode="enc" if mode == "down" else "dec",
                                 resample_mode=mode, resample_type="conv")
        expected = int(16 * (0.5 if mode == "down" else 2))
        assert out.shape == (2, expected, expected, 16)
        assert np.isfinite(np.asarray(out)).all()
        s = float(jnp.std(out))
        assert 0.05 < s < 20


def test_mp_silu_gradient_stable_at_extremes():
    """Naive 1/(1+exp(-x)) overflows at |x|>~88 and autodiff turns it into
    NaN gradients while the forward still looks fine — regression guard for
    the stable-sigmoid form (hit via large unnormalized cond inputs)."""
    import jax
    import jax.numpy as jnp
    from terrain_diffusion_tpu.ops import mp

    for v in (-150.0, -89.0, 0.0, 89.0, 150.0):
        y, g = jax.value_and_grad(lambda x: mp.mp_silu(x))(jnp.float32(v))
        assert np.isfinite(float(y)) and np.isfinite(float(g)), (v, y, g)
        gs = jax.grad(lambda x: mp.mp_sigmoid(x))(jnp.float32(v))
        assert np.isfinite(float(gs))
    # forward parity with the naive form where it is well-defined
    x = jnp.linspace(-20, 20, 101)
    naive = (x * (1.0 / (1.0 + jnp.exp(-x)))) / 0.596
    np.testing.assert_allclose(mp.mp_silu(x), naive, rtol=1e-6, atol=1e-7)


def test_autoencoder_conv_resample_roundtrip(tmp_path, rng):
    """A conv-resample autoencoder's learned resample weights must survive
    save_model/load_model (they were silently dropped from the name map)."""
    from terrain_diffusion_tpu.nn import torch_compat as tc
    from terrain_diffusion_tpu.nn.edm_autoencoder import (EDMAutoencoder,
                                                          EDMAutoencoderConfig)

    ae = EDMAutoencoder(EDMAutoencoderConfig(
        image_size=32, in_channels=1, latent_channels=2, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1,
        attn_resolutions=(), midblock_attention=False,
        block_kwargs={"resample_type": "conv"}))
    params = ae.init(jax.random.key(0))
    # the decoder's up block must actually carry learned resample weights
    up_blocks = [n for n, *_ in ae.decoder_plan if n.startswith("up")]
    assert up_blocks and "resample" in params["decoder"][up_blocks[0]]
    tc.save_model(ae, params, str(tmp_path / "ae"))
    _, loaded = tc.load_model(str(tmp_path / "ae"))
    w0 = np.asarray(params["decoder"][up_blocks[0]]["resample"]["w"])
    w1 = np.asarray(loaded["decoder"][up_blocks[0]]["resample"]["w"])
    np.testing.assert_allclose(w0, w1, rtol=1e-6)


def test_save_load_roundtrip_every_leaf_exact(tmp_path):
    """EVERY param leaf must survive save_model/load_model bit-exactly.

    Guards the safetensors non-contiguity trap: serializing a transposed
    VIEW writes the underlying buffer with strides ignored, scrambling the
    weight on disk — and for shape-symmetric weights the load-side inverse
    transpose coincidentally undoes it, so only a full-tree comparison
    with asymmetric shapes catches it."""
    from terrain_diffusion_tpu.nn import torch_compat as tc
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig

    m = EDMUnet2D(EDMUnetConfig(
        image_size=16, in_channels=2, out_channels=3, model_channels=8,
        model_channel_mults=(1, 2), layers_per_block=1,
        attn_resolutions=(), midblock_attention=False,
        conditional_inputs=(("tensor", 5, 1.0),)))
    p = m.init(jax.random.key(3))
    tc.save_model(m, p, str(tmp_path / "m"))
    _, p2 = tc.load_model(str(tmp_path / "m"))
    import jax.tree_util as jtu

    leaves = jtu.tree_flatten_with_path(p)[0]
    leaves2 = jax.tree.leaves(p2)
    assert len(leaves) == len(leaves2)
    for (path, a), b in zip(leaves, leaves2):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jtu.keystr(path))


def test_perceptron_checkpoint_roundtrip(tmp_path):
    """Perceptron saves/loads through the shared checkpoint path with the
    reference's nets.{k}.{seq_idx} naming (Dropout shifts the indices)."""
    from terrain_diffusion_tpu.nn import torch_compat as tc
    from terrain_diffusion_tpu.nn.perceptron import (Perceptron,
                                                     PerceptronConfig)

    for i, (dropout, bias, ne) in enumerate(
            ((0.0, True, 1), (0.3, True, 2), (0.0, False, 1))):
        m = Perceptron(PerceptronConfig(
            in_dim=8, out_dim=3, hidden_dims=(16, 16), dropout=dropout,
            bias=bias, random_ensembles=ne))
        p = m.init(jax.random.key(0))
        d = str(tmp_path / f"p{i}")
        tc.save_model(m, p, d)
        m2, p2 = tc.load_model(d)
        assert type(m2).__name__ == "Perceptron"
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # dropout path is exercised (training + key)
        out = m.apply(p, np.ones((4, 8), np.float32),
                      key=jax.random.key(1), training=True)
        assert np.isfinite(np.asarray(out)).all()
