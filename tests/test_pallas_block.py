"""Parity tests for the fused residual-block Pallas kernel.

The kernel (ops/pallas_block.py) must reproduce the XLA block path
(`nn/layers.py::unet_block_apply`, reference `unet_block.py:116-156`)
exactly up to float reassociation.  Runs in Pallas interpreter mode on the
CPU test mesh; the TPU-compiled path is exercised by the decoder benchmark.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from terrain_diffusion_tpu.nn import layers as L
from terrain_diffusion_tpu.ops import mp
from terrain_diffusion_tpu.ops import pallas_block as pb

KEY = jax.random.key(0)


def _rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))


@pytest.mark.parametrize(
    "cin,cout,mode,attention",
    [
        (64, 64, "enc", False),   # same-C enc (pixel norm + residual)
        (32, 64, "enc", False),   # enc with 1x1 projection before the norm
        (64, 64, "dec", False),   # same-C dec
        (128, 64, "dec", False),  # dec consuming a 2C skip concat
        (64, 64, "dec", True),    # fused conv body + XLA attention tail
    ])
def test_fused_block_matches_xla(rng, cin, cout, mode, attention):
    p = L.unet_block_init(KEY, cin, cout, 32, mode=mode, attention=attention)
    x = jnp.asarray(rng.standard_normal((2, 32, 128, cin)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    ref = L.unet_block_apply(p, x, emb, mode=mode, attention=attention)
    out = L.unet_block_apply(p, x, emb, mode=mode, attention=attention,
                             block_impl="pallas_interpret")
    assert _rel_err(ref, out) < 1e-5


def test_fused_block_tiling_invariance(rng):
    """Halo assembly: output must not depend on the row-tile size."""
    C, H, W = 32, 64, 128
    p = L.unet_block_init(KEY, C, C, 16, mode="enc")
    x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    ref = L.unet_block_apply(p, x, emb, mode="enc")

    def norm_scaled(w):
        wn = mp.normalize(w)
        return wn * (1.0 / math.sqrt(int(np.prod(w.shape[:-1]))))

    c = L.mp_conv_apply(p["emb_linear"], emb, gain=p["emb_gain"]) + 1.0
    c = c / jnp.sqrt(jnp.mean(jnp.square(c), axis=-1, keepdims=True) + 1e-8)
    for th in (8, 16, 64):
        out = pb.fused_block_apply(
            x, norm_scaled(p["conv_res0"]["w"]), norm_scaled(p["conv_res1"]["w"]),
            c, None, mode="enc", pixel_norm=True, res_balance=0.3,
            clip_act=256.0, tile_rows=th, interpret=True)
        assert _rel_err(ref, out) < 1e-5, th


def test_fused_block_ineligible_fallback(rng):
    """Blocks the kernel does not cover fall back to XLA (identical result)."""
    p = L.unet_block_init(KEY, 16, 16, 8, mode="enc")
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16)), jnp.float32)  # tiny map
    emb = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    ref = L.unet_block_apply(p, x, emb, mode="enc")
    out = L.unet_block_apply(p, x, emb, mode="enc", block_impl="pallas_interpret")
    assert _rel_err(ref, out) == 0.0


def test_unet_forward_with_pallas_blocks(rng):
    """Whole-model forward with block_impl='pallas_interpret' in block_kwargs
    matches the default path (eligible blocks fused, the rest unchanged)."""
    from terrain_diffusion_tpu.nn import EDMUnet2D, EDMUnetConfig

    def build(block_kwargs):
        return EDMUnet2D(EDMUnetConfig(
            image_size=128, in_channels=3, out_channels=3, model_channels=32,
            model_channel_mults=(1, 2), layers_per_block=1,
            attn_resolutions=(), midblock_attention=False,
            conditional_inputs=(), fourier_scale="pos", disable_out_gain=True,
            block_kwargs=block_kwargs))

    m_ref = build({})
    m_pal = build({"block_impl": "pallas_interpret"})
    p = jax.jit(m_ref.init)(KEY)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    nl = jnp.full((1,), 0.7, jnp.float32)
    ref = m_ref.apply(p, x, nl, [])
    out = m_pal.apply(p, x, nl, [])
    rel = _rel_err(ref, out)
    # 0 would mean no block actually routed through the fused kernel
    # (disable_out_gain keeps the output nonzero at random init)
    assert 0 < rel < 1e-5, rel


def test_fused_block_skip_input_concat(rng):
    """Two-input fused dec block == mp_concat followed by the 2C block,
    and the XLA path with skip_input == the pre-concatenated XLA path."""
    p = L.unet_block_init(KEY, 128, 64, 32, mode="dec")
    x = jnp.asarray(rng.standard_normal((2, 32, 128, 64)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 32, 128, 64)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    cat = mp.mp_concat([x, skip], axis=-1, w=0.3)
    ref = L.unet_block_apply(p, cat, emb, mode="dec")
    xla = L.unet_block_apply(p, x, emb, mode="dec", skip_input=skip,
                             concat_w=0.3)
    assert _rel_err(ref, xla) == 0.0
    out = L.unet_block_apply(p, x, emb, mode="dec", skip_input=skip,
                             concat_w=0.3, block_impl="pallas_interpret")
    assert 0 < _rel_err(ref, out) < 1e-5


def test_fused_out_conv_matches_xla(rng):
    from terrain_diffusion_tpu.ops import pallas_block as pb
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 32, 1)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 128, 128, 32)), jnp.float32)
    ref = L.mp_conv_apply(p, x, gain=0.7)
    w = mp.normalize(p["w"]) * (0.7 / np.sqrt(9 * 32))
    out = pb.fused_conv3x3_apply(x, w, interpret=True)
    assert _rel_err(ref, out) < 1e-5
    carry = pb.fused_conv3x3_apply(x, w, interpret=True, halo_mode="carry")
    assert jnp.array_equal(out, carry)


def test_eligibility_routing_matrix():
    """Wiring guard: the production decoder shapes must stay routed to the
    fused kernel in the regimes where it was measured to win, and must
    fall back everywhere else."""
    x = lambda n, h, w, c: jnp.zeros((n, h, w, c), jnp.bfloat16)
    # serving latency regime: fused
    assert pb.block_eligible(x(2, 512, 512, 64))
    assert pb.block_eligible(x(2, 512, 512, 128))   # dec skip concat width
    assert pb.block_eligible(x(1, 256, 256, 128))
    assert pb.block_eligible(x(2, 128, 128, 192))
    # measured XLA-wins regimes: fall back
    assert not pb.block_eligible(x(8, 512, 512, 64))    # batch crossover
    assert not pb.block_eligible(x(2, 64, 64, 192))     # small maps (base)
    assert not pb.block_eligible(x(2, 512, 512, 64), training=True)
    assert not pb.block_eligible(x(2, 512, 512, 64), conv_type="mobile")
    # out/in conv routing
    assert pb.conv3x3_eligible(x(2, 512, 512, 64))
    assert pb.conv3x3_eligible(x(2, 512, 512, 6))
    assert not pb.conv3x3_eligible(x(8, 512, 512, 64))


@pytest.mark.parametrize(
    "cin,cout,mode,with_x2,preup",
    [
        (32, 32, "enc", False, 1),   # scratch seed + multi-tile slide
        (48, 32, "enc", False, 1),   # 1x1 projection before the norm
        (32, 32, "dec", True, 1),    # dual scratch (skip concat)
        (32, 32, "dec", False, 2),   # half-res carried halo (fused up)
    ])
def test_carry_halo_matches_specs(rng, cin, cout, mode, with_x2, preup):
    """halo_mode='carry' (one input window per step + carried VMEM halo)
    must be bit-identical to the triple-spec assembly."""
    H, W = (64, 128) if preup == 1 else (32, 64)
    p = L.unet_block_init(KEY, cin * (2 if with_x2 else 1), cout, 16,
                          mode=mode)
    x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
    x2 = (jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
          if with_x2 else None)
    emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    c = L.mp_conv_apply(p["emb_linear"], emb, gain=p["emb_gain"]) + 1.0
    c = c / jnp.sqrt(jnp.mean(jnp.square(c), axis=-1, keepdims=True) + 1e-8)
    wskip = None
    if "conv_skip" in p:
        ws = mp.normalize(p["conv_skip"]["w"])
        ws = ws * (1.0 / math.sqrt(int(np.prod(ws.shape[:-1]))))
        wskip = ws.reshape(ws.shape[2], ws.shape[3])

    def norm_scaled(w):
        wn = mp.normalize(w)
        return wn * (1.0 / math.sqrt(int(np.prod(w.shape[:-1]))))

    kw = dict(mode=mode, pixel_norm=(mode == "enc"), res_balance=0.3,
              clip_act=256.0, tile_rows=16,
              concat_scales=(0.7, 0.3) if with_x2 else None,
              pre_upsample=preup, interpret=True)
    a = pb.fused_block_apply(x, norm_scaled(p["conv_res0"]["w"]),
                             norm_scaled(p["conv_res1"]["w"]), c, wskip, x2,
                             halo_mode="specs", **kw)
    b = pb.fused_block_apply(x, norm_scaled(p["conv_res0"]["w"]),
                             norm_scaled(p["conv_res1"]["w"]), c, wskip, x2,
                             halo_mode="carry", **kw)
    assert jnp.array_equal(a, b)


def test_fused_up_block_matches_xla(rng):
    """dec up-block with the nearest-x2 upsample fused into the kernel
    (half-res inputs) must match the XLA repeat + block path."""
    p = L.unet_block_init(KEY, 32, 32, 16, mode="dec", resample_mode="up")
    x = jnp.asarray(rng.standard_normal((2, 16, 64, 32)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    ref = L.unet_block_apply(p, x, emb, mode="dec", resample_mode="up")
    out = L.unet_block_apply(p, x, emb, mode="dec", resample_mode="up",
                             block_impl="pallas_interpret")
    assert ref.shape == out.shape == (2, 32, 128, 32)
    assert 0 < _rel_err(ref, out) < 1e-5


def test_tile_row_picker_geometry():
    """Pin the hardware-tuned tile geometry (ops/pallas_block.py
    `_pick_tile_rows`).  These constants were set by interleaved A/B/C of
    the FULL decoder forward on a v5e chip (see the picker's comments);
    per-block micro-timings on the remote harness are misleading, so a
    change here must come with a new full-forward measurement."""
    pick = pb._pick_tile_rows
    # carry mode (default): ~8192 px/tile pipelining cap, 4 MB VMEM budget
    assert pick(512, 512, 64, 64) == 16
    assert pick(512, 512, 128, 128) == 16
    assert pick(512, 512, 192, 64) == 16    # 4 MB budget: th 8 -> 16
    assert pick(256, 256, 64, 64) == 32
    assert pick(256, 256, 320, 320) == 16   # 4 MB budget: th 8 -> 16
    assert pick(128, 128, 448, 448) == 32
    # specs mode keeps the round-2/3 2 MB / 8192 px tuning
    assert pick(512, 512, 64, 64, halo_mode="specs") == 16
    assert pick(512, 512, 192, 64, halo_mode="specs") == 8
    # explicit override always wins; result always divides H
    assert pick(512, 512, 64, 64, tile_rows=64) == 64
    assert pick(96, 512, 64, 64) in (8, 16, 32, 96)
    assert 96 % pick(96, 512, 64, 64) == 0
