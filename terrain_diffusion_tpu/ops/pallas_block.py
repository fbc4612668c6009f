"""Fused MP U-Net residual block as a Pallas TPU kernel.

Why: at decoder-stage shapes (512x512 spatial, 64..256 channels, batch 1-8)
XLA compiles each 3x3 conv with a space-to-batch rewrite whose pad/select/
copy traffic makes the whole stage HBM-bandwidth-bound (measured 26 GB
accessed per image against a ~2 GB activation floor; 87% of v5e HBM peak).
This kernel evaluates one entire residual block -- pixel-norm, mp_silu,
conv3x3, per-channel emb gain, mp_silu, conv3x3, optional 1x1 skip
projection, magnitude-preserving residual sum, clip -- in VMEM, so HBM
traffic per block drops to one read of x plus one write of the output.

Reference behaviour being fused: `unet_block.py:116-156` of the reference
(see `terrain_diffusion_tpu.nn.layers.unet_block_apply`, the XLA path,
which stays the default and the autodiff/training path).  The kernel is
inference-only (no dropout) and covers `conv_type='default'` blocks; the
attention tail, learned conv resampling, and downsampling stay outside
(parameter-free nearest-up resampling is fused via `pre_upsample=2`).

Convolution strategy: 3x3 conv as MXU matmuls with f32 accumulation.
W-direction tap inputs are shifted copies (slice + zero column); H taps are
row slices.  For narrow channels (Cin <= 64) the three W-taps are packed
into one (rows*W, 3*Cin) "patch" matmul per H-tap so the MXU contraction
dim is 3*Cin instead of Cin (64-wide K runs the 128x128 MXU at 1/4
utilization; 192-wide K fixes that).  Rows are tiled over a grid with a
2-row halo per conv; halo rows outside the image are zeroed via a
broadcast row mask to reproduce SAME zero-padding exactly.

Halo fetch strategy (`halo_mode`): 'specs' fetches three overlapping input
windows per grid step (prev/this/next row tile) through BlockSpecs; 'carry'
(the default) fetches each input row tile exactly once and carries the
2-row halo in a VMEM scratch, with the output for row tile j written at
grid step j+1.  Measured on a v5e chip (decoder b2 512px full forward,
interleaved A/B, 8 reps): carry 36.33 ms vs specs 36.65 ms (-0.9%); both
variants are bit-compared in interpreter-mode tests.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_XLA_BATCH_CUTOVER = int(os.environ.get("TDTPU_PALLAS_BATCH_CUTOVER", "8"))
_INV_SILU_GAIN = 1.0 / 0.596  # mp_silu divisor, folded into conv weights


def _silu(x):
    # bare x*sigmoid(x); the magnitude-preserving 1/0.596 is pre-folded
    # into the downstream conv weight.  Spelled with explicit same-dtype
    # constants: jax.nn.sigmoid emits an f32 literal broadcast that
    # Mosaic refuses to verify against bf16 vectors.
    one = jnp.asarray(1.0, x.dtype)
    return x / (one + jnp.exp(-x))


def _row_mask(shape_rows, r0, H, dtype):
    """(R, 1, 1) 0/1 mask for absolute rows r0..r0+R outside [0, H)."""
    rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (shape_rows, 1, 1), 0)
    return ((rows >= 0) & (rows < H)).astype(dtype)


def _apply_row_mask(x, R, r0, H):
    """x * row_mask for absolute rows r0..r0+R.

    Measured dead end (round 5, do not retry): gating this behind
    `lax.cond((r0 < 0) | (r0 + R > H), ...)` so interior row tiles skip
    the full-buffer multiply is performance-NEUTRAL on v5e — interleaved
    A/B of the full decoder-64 forward (b2 512px bf16, 9 reps,
    data-dependency-forced sync): baseline min/median 31.35/31.78 ms/img
    vs edge-only 31.40/31.97.  The mask multiply is already cheap
    (~27 us/block attribution, round 3) and the scf.if control flow costs
    what the skipped passes save."""
    return x * _row_mask(R, r0, H, x.dtype)


def _nearest_up2(x, interpret):
    """Nearest x2 upsample of (R, W, C) along rows and W.  Compiled mode
    uses pltpu.repeat (`jnp.repeat`'s reshape lowering hits Mosaic's
    "unsupported shape cast"); the interpreter lacks pltpu.repeat, so the
    CPU test path keeps the jnp form."""
    if interpret:
        return jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return pltpu.repeat(pltpu.repeat(x, 2, axis=0), 2, axis=1)


def _shifted_pair(a):
    """(a shifted right with col0 zeroed, a shifted left with last col zeroed).

    a[..., w-1, :] / a[..., w+1, :] under SAME zero padding; the dx=0 and
    dx=2 conv tap inputs.  a is (R, W, C); the W axis is 1.
    """
    z = jnp.zeros_like(a[:, :1])
    a_m1 = jnp.concatenate([z, a[:, :-1]], axis=1)
    a_p1 = jnp.concatenate([a[:, 1:], z], axis=1)
    return a_m1, a_p1


def _dot_precision(dtype):
    """bf16 inputs: native MXU passes.  f32 inputs: HIGHEST (multi-pass) so
    the fused path keeps f32-grade accuracy like XLA's f32 convs do."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype) == jnp.float32 else jax.lax.Precision.DEFAULT)


def _conv3x3(a, w_ref, rows_out, acc_dtype, pack_taps, pack_n=False):
    """3x3 conv over a (R, W, Cin) with weights w_ref (3, 3, Cin, Cout).

    Output rows j correspond to input centre row j+1, j in [0, rows_out).
    pack_taps=True: dx taps packed into the contraction dim (one
    (rows*W, 3Cin) matmul per dy).  pack_n=True: dy taps packed into the
    OUTPUT dim — matmuls produce (rows, W, 3Cout) and y[j] sums the three
    dy-shifted Cout-slices.  Narrow Cout (<= 64) runs the 128-wide MXU at
    <= 1/2 output utilization; 3Cout = 192 fills it (the decoder's
    64-channel top level is ~40% of its FLOPs).

    Measured dead end (round 4, do not retry): packing dx into the output
    dim too (one (R*W, Cin) @ (Cin, 9*Cout) matmul + nine row/col-shifted
    slice adds, removing the _shifted_pair input copies) FAILS Mosaic
    compile — the column-shift `concatenate` on a Cout-strided slice of
    the matmul output needs a lane-offset relayout Mosaic rejects
    ("result/input offset mismatch on non-concat dimension").  dx shifts
    must stay on the matmul INPUT side, where operands start at lane 0.
    """
    R, W, Cin = a.shape
    Cout = w_ref.shape[-1]
    prec = _dot_precision(a.dtype)
    a_m1, a_p1 = _shifted_pair(a)
    if pack_n:
        # R_full[r] = sum_dx buf_dx[r] @ concat_N([W[dy, dx] for dy])
        # y[j]     = sum_dy R_full[j + dy][:, dy*Cout : (dy+1)*Cout]
        if pack_taps:
            patch = jnp.concatenate([a_m1, a, a_p1], axis=-1)  # (R, W, 3Cin)
            wn = jnp.concatenate(
                [w_ref[dy].reshape(3 * Cin, Cout) for dy in range(3)],
                axis=-1)  # (3Cin, 3Cout)
            acc = jax.lax.dot_general(
                patch.reshape(R * W, 3 * Cin), wn,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype, precision=prec)
        else:
            acc = jnp.zeros((R * W, 3 * Cout), acc_dtype)
            for dx, buf in ((0, a_m1), (1, a), (2, a_p1)):
                wn = jnp.concatenate(
                    [w_ref[dy, dx] for dy in range(3)], axis=-1)
                acc = acc + jax.lax.dot_general(
                    buf.reshape(R * W, Cin), wn,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype, precision=prec)
        full = acc.reshape(R, W, 3 * Cout)
        return (full[0:rows_out, :, :Cout]
                + full[1:rows_out + 1, :, Cout:2 * Cout]
                + full[2:rows_out + 2, :, 2 * Cout:])
    acc = jnp.zeros((rows_out * W, Cout), acc_dtype)
    if pack_taps:
        patch = jnp.concatenate([a_m1, a, a_p1], axis=-1)  # (R, W, 3Cin)
        for dy in range(3):
            lhs = patch[dy:dy + rows_out].reshape(rows_out * W, 3 * Cin)
            acc = acc + jax.lax.dot_general(
                lhs, w_ref[dy].reshape(3 * Cin, Cout),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype, precision=prec)
    else:
        for dy in range(3):
            for dx, buf in ((0, a_m1), (1, a), (2, a_p1)):
                lhs = buf[dy:dy + rows_out].reshape(rows_out * W, Cin)
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype, precision=prec)
    return acc.reshape(rows_out, W, Cout)


def _block_kernel(xm1_ref, x_ref, xp1_ref, w0_ref, w1_ref, c_ref, *rest,
                  H, mode, pixel_norm, res_balance, clip_act, has_skip,
                  concat_scales, pre_up, compute_dtype, interpret=False):
    rest = list(rest)
    if concat_scales is not None:
        x2m1_ref, x2_ref, x2p1_ref = rest[:3]
        rest = rest[3:]
    if has_skip:
        wsk_ref, o_ref = rest
    else:
        (o_ref,) = rest
    n = pl.program_id(0)
    i = pl.program_id(1)
    if pre_up:
        # input refs are HALF resolution: assemble (TH/2+2) rows and
        # nearest-x2 upsample in VMEM (the XLA path materializes the
        # upsampled map in HBM first)
        THh, Wh, Cin = x_ref.shape[1:]
        TH, W = 2 * THh, 2 * Wh
        xs = jnp.concatenate(
            [xm1_ref[0, THh - 1:], x_ref[0], xp1_ref[0, :1]], axis=0)
        xs = _nearest_up2(xs, interpret)  # (TH+4, W, Cin)
    else:
        TH, W, Cin = x_ref.shape[1:]
        xs = jnp.concatenate(
            [xm1_ref[0, TH - 2:], x_ref[0], xp1_ref[0, :2]], axis=0)
    x2s = None
    if concat_scales is not None:
        x2s = jnp.concatenate(
            [x2m1_ref[0, TH - 2:], x2_ref[0], x2p1_ref[0, :2]], axis=0)
    _block_body(xs, x2s, w0_ref, w1_ref, c_ref,
                wsk_ref if has_skip else None, o_ref, n=n,
                r0=i * TH - 2, TH=TH, W=W, H=H, mode=mode,
                pixel_norm=pixel_norm, res_balance=res_balance,
                clip_act=clip_act, concat_scales=concat_scales,
                compute_dtype=compute_dtype)


def _block_body(xs, x2s, w0_ref, w1_ref, c_ref, wsk_ref, o_ref, *, n, r0,
                TH, W, H, mode, pixel_norm, res_balance, clip_act,
                concat_scales, compute_dtype):
    """Shared block math on assembled rows xs (TH+4, W, Cin)."""
    Cin = xs.shape[-1]
    Cmid = w0_ref.shape[-1]
    has_skip = wsk_ref is not None
    f32 = jnp.float32

    # ---- rows [r0, r0+TH+4) with out-of-image rows zeroed (masking after
    # the concat is exact: a 0/1 row mask distributes over channel concat)
    xs = xs.astype(f32)
    if concat_scales is not None:
        # fused magnitude-preserving skip concat (mp_concat): the two
        # halves are scaled in VMEM instead of materializing the 2C
        # tensor in HBM
        s1, s2 = concat_scales
        xs = jnp.concatenate([xs * s1, x2s.astype(f32) * s2], axis=-1)
        Cin = xs.shape[-1]
    xs = _apply_row_mask(xs, TH + 4, r0, H)

    if mode == "enc":
        if has_skip:  # 1x1 projection BEFORE pixel norm (reference order)
            Cproj = wsk_ref.shape[-1]
            xs = jax.lax.dot_general(
                xs.reshape((TH + 4) * W, Cin).astype(compute_dtype),
                wsk_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_dot_precision(compute_dtype),
            ).reshape(TH + 4, W, Cproj)
        if pixel_norm:
            rms = jnp.sqrt(jnp.mean(jnp.square(xs), axis=-1, keepdims=True))
            xs = xs / (1e-4 + rms)
        xres = xs[2:TH + 2]
    else:
        xres = xs[2:TH + 2]
        if has_skip:
            Cproj = wsk_ref.shape[-1]
            xres = jax.lax.dot_general(
                xres.reshape(TH * W, xres.shape[-1]).astype(compute_dtype),
                wsk_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=_dot_precision(compute_dtype),
            ).reshape(TH, W, Cproj)

    # Activations (silu, gain, masks) stay f32: a bf16-activation variant
    # measured SLOWER on v5e (b8 17.6 vs 17.2 ms/img — the VPU gets no
    # win from bf16 element ops here and the extra converts cost).

    # ---- first conv over silu(xs); 1/0.596 is folded into w0
    a = _silu(xs).astype(compute_dtype)
    h = _conv3x3(a, w0_ref, TH + 2, f32,
                 pack_taps=a.shape[-1] <= 64,
                 pack_n=Cmid <= 64)  # rows r0+1 .. r0+TH+3

    # ---- emb gain + act; zero rows outside the image (conv1's zero pad)
    cvec = c_ref[n].astype(f32)  # (Cmid,)
    h = _apply_row_mask(_silu(h * cvec[None, None, :]), TH + 2, r0 + 1, H)

    # ---- second conv; 1/0.596 folded into w1
    Cout_blk = w1_ref.shape[-1]
    h = h.astype(compute_dtype)
    y = _conv3x3(h, w1_ref, TH, f32, pack_taps=Cmid <= 64,
                 pack_n=Cout_blk <= 64)  # (TH, W, Cout)

    # ---- magnitude-preserving residual + clip
    t = res_balance
    out = (xres * (1.0 - t) + y * t) / math.sqrt((1.0 - t) ** 2 + t ** 2)
    if clip_act is not None:
        out = jnp.clip(out, -clip_act, clip_act)
    o_ref[0] = out.astype(o_ref.dtype)


def _block_kernel_carry(x_ref, w0_ref, w1_ref, c_ref, *rest,
                        H, mode, pixel_norm, res_balance, clip_act,
                        has_skip, concat_scales, pre_up, compute_dtype,
                        interpret=False):
    """Carry-halo variant: ONE input window per grid step; the 2 (1 at half
    res) halo rows above come from a VMEM scratch carried across steps, so
    each input row is DMA'd once instead of three times.  Output for row
    tile j is written at grid step i = j+1 (delayed one step): step i has
    tile j's rows below its window via x_ref[:halo], and tiles above from
    the scratch.  Step 0 only seeds the scratch (zero top padding = the
    conv's SAME padding, making the top row mask a no-op by construction).
    """
    rest = list(rest)
    x2_ref = rest.pop(0) if concat_scales is not None else None
    wsk_ref = rest.pop(0) if has_skip else None
    o_ref = rest.pop(0)
    if concat_scales is not None:
        s_ref, s2_ref = rest
    else:
        (s_ref,) = rest
        s2_ref = None
    n = pl.program_id(0)
    i = pl.program_id(1)
    if pre_up:
        THh, Wh, _ = x_ref.shape[1:]
        TH, W = 2 * THh, 2 * Wh
        hh = 1  # halo rows carried at half resolution
    else:
        TH, W, _ = x_ref.shape[1:]
        hh = 2

    @pl.when(i == 0)
    def _seed():
        s_ref[:hh] = jnp.zeros_like(s_ref[:hh])
        s_ref[hh:] = x_ref[0]
        if s2_ref is not None:
            s2_ref[:hh] = jnp.zeros_like(s2_ref[:hh])
            s2_ref[hh:] = x2_ref[0]

    @pl.when(i > 0)
    def _compute():
        xs = jnp.concatenate([s_ref[...], x_ref[0, :hh]], axis=0)
        if pre_up:
            xs = _nearest_up2(xs, interpret)  # (TH+4, W, Cin)
        x2s = None
        if s2_ref is not None:
            x2s = jnp.concatenate([s2_ref[...], x2_ref[0, :hh]], axis=0)
        _block_body(xs, x2s, w0_ref, w1_ref, c_ref, wsk_ref, o_ref,
                    n=n, r0=(i - 1) * TH - 2, TH=TH, W=W, H=H, mode=mode,
                    pixel_norm=pixel_norm, res_balance=res_balance,
                    clip_act=clip_act, concat_scales=concat_scales,
                    compute_dtype=compute_dtype)
        # slide the carried window: [last hh rows, new block]
        top = s_ref[-hh:]
        s_ref[:hh] = top
        s_ref[hh:] = x_ref[0]
        if s2_ref is not None:
            top2 = s2_ref[-hh:]
            s2_ref[:hh] = top2
            s2_ref[hh:] = x2_ref[0]


def _pick_tile_rows(H, W, cin, cmid, tile_rows=None, itemsize=2,
                    halo_mode="carry"):
    if tile_rows is not None:
        return tile_rows
    # Carry mode fetches ONE input window per step (vs 3 for specs), so
    # the VMEM window budget can double; the pipelining sweet spot (~8192
    # px/tile) does NOT move.
    # Carry numbers: tuned by interleaved A/B/C of the FULL decoder
    # forward on v5e (b2 512px, bf16, 9 reps, data-dependency-forced
    # sync — per-block micro-timings mislead on this remote harness):
    #   2 MB/8192px 18.88 | 4 MB/8192px 18.65 | 4 MB/16384px+depth>=4
    #   19.99 ms/img.  The 4 MB budget only coarsens wide-channel shapes
    #   (512-wide cin>=192: th 8->16; 256-wide cin>=320: th 8->16);
    #   coarsening the ~8192 px/tile pipelining cap is a measured 7%
    #   end-to-end loss.
    # Specs (triple-fetch) numbers, measured rounds 2-3:
    # - VMEM: ~2 MB x-blocks keep triple-fetch double-buffered pipeline
    #   windows + f32 accumulators + packed patches on chip (bigger tiles
    #   OOM at 512x512x64); f32 activations halve the rows.
    # - pipelining: ~8192 pixels per tile (512-wide maps: th=16 runs 19%
    #   faster than th=32; 256-wide maps prefer th=32).
    budget = (4 if halo_mode == "carry" else 2) * 1024 * 1024
    th = max(8, min(budget // max(1, W * cin * itemsize),
                    8192 // max(1, W)))
    th = 1 << int(math.floor(math.log2(th)))
    while H % th:
        th //= 2
    return max(8, min(th, H))


def block_eligible(x, *, conv_type="default", resample_mode="keep",
                   training=False, dropout=0.0, no_padding=False,
                   expansion_factor=1, activation="silu", tile_rows=None,
                   min_pixels=128 * 128, pre_upsample=1, halo_mode="carry"):
    """Whether the fused kernel covers this block's conv body exactly."""
    if conv_type != "default" or no_padding or expansion_factor != 1:
        return False
    if training:
        return False  # inference-only: the kernel defines no VJP
    if activation != "silu":
        return False
    if x.ndim != 4:
        return False
    N, H, W, C = x.shape
    H, W = H * pre_upsample, W * pre_upsample  # kernel output resolution
    if H < 8 or W % 8 or W < 128:
        return False  # tiny maps: XLA is fine, tiling constraints are not
    if tile_rows is None and min_pixels and N >= _XLA_BATCH_CUTOVER:
        # measured on v5e: at this batch XLA abandons the space-to-batch
        # rewrite and its convs catch up with the kernel - keep XLA for
        # large coalesced batches (TDTPU_PALLAS_BATCH_CUTOVER overrides)
        return False
    if tile_rows is None and H * W < min_pixels:
        # measured on v5e: the kernel wins 1.3-2.6x from 128x128 up
        # (XLA's space-to-batch conv rewrite is bandwidth-bound there,
        # worst for narrow channels and skip-concat dec blocks); below
        # that XLA's convs are already compute-bound
        return False
    th = _pick_tile_rows(H, W, C, C, tile_rows, x.dtype.itemsize, halo_mode)
    return H % th == 0


@functools.partial(
    jax.jit,
    static_argnames=("mode", "pixel_norm", "res_balance", "clip_act",
                     "tile_rows", "concat_scales", "pre_upsample",
                     "interpret", "halo_mode"))
def fused_block_apply(x, w0, w1, c, wskip=None, x2=None, *, mode="enc",
                      pixel_norm=True, res_balance=0.3, clip_act=256.0,
                      tile_rows=None, concat_scales=None, pre_upsample=1,
                      interpret=False, halo_mode="carry"):
    """Fused residual-block forward.

    x      : (N, H, W, Cin) activations (bf16 or f32).
    w0     : (3, 3, Cin', Cmid) normalized+scaled first conv weight, where
             Cin' = Cout for enc blocks with a skip projection (projection
             runs first), else Cin.
    w1     : (3, 3, Cmid, Cout) normalized+scaled second conv weight.
    c      : (N, Cmid) per-channel emb gain (already includes +1 and RMS
             normalization), or None for gain-free blocks.
    wskip  : (Cin, Cout) normalized+scaled 1x1 projection or None.
    x2     : optional second input of the same shape as x; when given (with
             static `concat_scales=(s1, s2)`) the kernel consumes
             mp_concat([x, x2]) without materializing it -- the dec-block
             skip join.

    The mp_silu 1/0.596 magnitude correction is folded into w0/w1 here, so
    callers pass plain normalized weights.
    """
    u = int(pre_upsample)
    assert u in (1, 2), pre_upsample
    N, H, W, Cin = x.shape
    H, W = H * u, W * u  # kernel output resolution
    if x2 is not None:
        assert x2.shape == x.shape and concat_scales is not None and u == 1
        Cin = 2 * Cin  # kernel-internal concat width
    Cmid = w0.shape[-1]
    Cout = w1.shape[-1]
    dt = x.dtype
    th = _pick_tile_rows(H, W, Cin, Cmid, tile_rows, dt.itemsize, halo_mode)
    assert H % th == 0, (H, th)
    if c is None:
        c = jnp.ones((N, Cmid), jnp.float32)
    c = c.astype(jnp.float32)
    w0 = (w0 * _INV_SILU_GAIN).astype(dt)
    w1 = (w1 * _INV_SILU_GAIN).astype(dt)

    nb = H // th
    kern_kw = dict(
        H=H, mode=mode, pixel_norm=pixel_norm,
        res_balance=float(res_balance),
        clip_act=None if clip_act is None else float(clip_act),
        has_skip=wskip is not None, concat_scales=concat_scales,
        pre_up=(u == 2), compute_dtype=dt, interpret=interpret)
    flops = 2 * N * H * W * (9 * w0.shape[2] * Cmid + 9 * Cmid * Cout
                             + (w0.shape[2] * Cout if wskip is not None else 0))
    scratch_shapes = []
    if halo_mode == "carry":
        # one input window per step + a carried halo scratch; output for
        # row tile j lands at step j+1 (see _block_kernel_carry)
        grid = (N, nb + 1)
        hh = 2 // u
        xspec1 = pl.BlockSpec(
            (1, th // u, W // u, x.shape[-1]),
            (lambda n, i: (n, jnp.minimum(i, nb - 1), 0, 0)),
            memory_space=pltpu.VMEM)
        in_specs = [
            xspec1,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c
        ]
        args = [x, w0, w1, c]
        scratch_shapes.append(
            pltpu.VMEM((th // u + hh, W // u, x.shape[-1]), dt))
        if x2 is not None:
            x2 = x2.astype(dt)
            in_specs.append(xspec1)
            args.append(x2)
            scratch_shapes.append(
                pltpu.VMEM((th // u + hh, W // u, x2.shape[-1]), dt))
        if wskip is not None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(wskip.astype(dt))
        kern = functools.partial(_block_kernel_carry, **kern_kw)
        out_spec = pl.BlockSpec(
            (1, th, W, Cout),
            (lambda n, i: (n, jnp.maximum(i - 1, 0), 0, 0)),
            memory_space=pltpu.VMEM)
        bytes_accessed = (x.size + N * H * W * Cout) * x.dtype.itemsize
    else:
        grid = (N, nb)
        xspec = lambda off: pl.BlockSpec(
            (1, th // u, W // u, x.shape[-1]),
            (lambda n, i: (n, jnp.clip(i + off, 0, nb - 1), 0, 0)),
            memory_space=pltpu.VMEM)
        in_specs = [
            xspec(-1), xspec(0), xspec(+1),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c
        ]
        args = [x, x, x, w0, w1, c]
        if x2 is not None:
            x2 = x2.astype(dt)
            in_specs += [xspec(-1), xspec(0), xspec(+1)]
            args += [x2, x2, x2]
        if wskip is not None:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(wskip.astype(dt))
        kern = functools.partial(_block_kernel, **kern_kw)
        out_spec = pl.BlockSpec(
            (1, th, W, Cout), (lambda n, i: (n, i, 0, 0)),
            memory_space=pltpu.VMEM)
        bytes_accessed = 3 * x.size * x.dtype.itemsize \
            + N * H * W * Cout * x.dtype.itemsize
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), dt),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=2 * N * H * W * Cmid),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Standalone fused 3x3 conv (the decoder's full-res output head)
# ---------------------------------------------------------------------------

def _conv_kernel(xm1_ref, x_ref, xp1_ref, w_ref, o_ref, *, H):
    i = pl.program_id(1)
    TH, W, Cin = x_ref.shape[1:]
    xs = jnp.concatenate(
        [xm1_ref[0, TH - 1:], x_ref[0], xp1_ref[0, :1]], axis=0)  # (TH+2,W,C)
    xs = _apply_row_mask(xs, TH + 2, i * TH - 1, H)
    y = _conv3x3(xs, w_ref, TH, jnp.float32, pack_taps=Cin <= 64)
    o_ref[0] = y.astype(o_ref.dtype)


def _conv_kernel_carry(x_ref, w_ref, o_ref, s_ref, *, H):
    """Carry-halo standalone conv: one input window per step, 1-row halo
    carried in scratch (3x3 conv needs only +-1 rows); output tile j is
    written at step j+1 (see _block_kernel_carry for the scheme)."""
    i = pl.program_id(1)
    TH, W, Cin = x_ref.shape[1:]

    @pl.when(i == 0)
    def _seed():
        s_ref[:1] = jnp.zeros_like(s_ref[:1])
        s_ref[1:] = x_ref[0]

    @pl.when(i > 0)
    def _compute():
        xs = jnp.concatenate([s_ref[...], x_ref[0, :1]], axis=0)  # (TH+2,..)
        xs = _apply_row_mask(xs, TH + 2, (i - 1) * TH - 1, H)
        y = _conv3x3(xs, w_ref, TH, jnp.float32, pack_taps=Cin <= 64)
        o_ref[0] = y.astype(o_ref.dtype)
        top = s_ref[-1:]
        s_ref[:1] = top
        s_ref[1:] = x_ref[0]


def conv3x3_eligible(x, tile_rows=None, halo_mode="carry"):
    if x.ndim != 4:
        return False
    N, H, W, C = x.shape
    if (H < 8 or W % 8 or W < 128 or H * W < 128 * 128
            or N >= _XLA_BATCH_CUTOVER):
        return False  # large batch: XLA convs win (see block_eligible)
    return H % _pick_tile_rows(H, W, max(C, 128), max(C, 128), tile_rows,
                               x.dtype.itemsize, halo_mode) == 0


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret",
                                              "halo_mode"))
def fused_conv3x3_apply(x, w, *, tile_rows=None, interpret=False,
                        halo_mode="carry"):
    """SAME-padded 3x3 conv as one Pallas program (large maps).

    w is the fully prepared HWIO weight (normalized, fan-in scaled, gain
    applied).  Used for the decoder's 512x512 output conv, where XLA's
    space-to-batch rewrite costs more than the conv's own FLOPs.
    """
    N, H, W, Cin = x.shape
    Cout = w.shape[-1]
    dt = x.dtype
    # VMEM lanes pad the channel dim to 128: budget tiles on the padded
    # width so narrow-channel inputs (e.g. the 6-channel network input)
    # don't blow the pipeline windows
    th = _pick_tile_rows(H, W, max(Cin, 128), max(Cin, 128), tile_rows,
                         dt.itemsize, halo_mode)
    assert H % th == 0, (H, th)
    nb = H // th
    if halo_mode == "carry":
        grid = (N, nb + 1)
        in_specs = [pl.BlockSpec(
            (1, th, W, Cin),
            (lambda n, i: (n, jnp.minimum(i, nb - 1), 0, 0)),
            memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM)]
        args = (x, w.astype(dt))
        out_spec = pl.BlockSpec(
            (1, th, W, Cout),
            (lambda n, i: (n, jnp.maximum(i - 1, 0), 0, 0)),
            memory_space=pltpu.VMEM)
        scratch_shapes = [pltpu.VMEM((th + 1, W, Cin), dt)]
        kern = functools.partial(_conv_kernel_carry, H=H)
        in_bytes = x.size
    else:
        grid = (N, nb)
        xspec = lambda off: pl.BlockSpec(
            (1, th, W, Cin),
            (lambda n, i: (n, jnp.clip(i + off, 0, nb - 1), 0, 0)),
            memory_space=pltpu.VMEM)
        in_specs = [xspec(-1), xspec(0), xspec(+1),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
        args = (x, x, x, w.astype(dt))
        out_spec = pl.BlockSpec(
            (1, th, W, Cout), (lambda n, i: (n, i, 0, 0)),
            memory_space=pltpu.VMEM)
        scratch_shapes = []
        kern = functools.partial(_conv_kernel, H=H)
        in_bytes = 3 * x.size
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cout), dt),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * Cin * Cout,
            bytes_accessed=(in_bytes + N * H * W * Cout) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
