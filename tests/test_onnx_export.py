"""First-party ONNX export: wire format round-trip + numerical parity.

Covers the game-mod export path (reference `onnx/export.py:24-250`):
graphs are serialized with `export/onnx_proto.py`, re-parsed, executed on
the numpy reference runtime, and compared against the JAX forward in f32.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from terrain_diffusion_tpu.export import onnx_proto as P
from terrain_diffusion_tpu.export.onnx_export import (
    build_unet_graph, export_unet, verify_export)
from terrain_diffusion_tpu.export.onnx_ref_runtime import run_model
from terrain_diffusion_tpu.nn.edm_unet import EDMUnet2D, EDMUnetConfig


@pytest.fixture(scope="module")
def attn_model():
    """Tiny U-Net with attention + all three conditional input types."""
    cfg = EDMUnetConfig(
        image_size=16, in_channels=3, out_channels=2, model_channels=16,
        model_channel_mults=(1, 2), layers_per_block=1,
        attn_resolutions=(8,), midblock_attention=True,
        logvar_channels=16,
        block_kwargs={"channels_per_head": 16},
        conditional_inputs=(("float", 8, 0.2), ("tensor", 6, 0.3),
                            ("embedding", 5, 0.1)),
    )
    model = EDMUnet2D(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # fresh init has out_gain == 0 → output identically zero → any
    # comparison would be vacuous; give it a trained-looking gain
    params["out_gain"] = jnp.asarray(0.7)
    return model, params


@pytest.fixture(scope="module")
def mobile_model():
    """Mobile-conv + leaky_relu + positional noise embedding variant."""
    cfg = EDMUnetConfig(
        image_size=16, in_channels=2, model_channels=16,
        model_channel_mults=(1, 2), layers_per_block=1,
        midblock_attention=False, logvar_channels=16,
        fourier_scale="pos",
        block_kwargs={"conv_type": "mobile", "expansion_factor": 2,
                      "activation": "leaky_relu"},
    )
    model = EDMUnet2D(cfg)
    params = model.init(jax.random.PRNGKey(1))
    params["out_gain"] = jnp.asarray(-0.5)
    return model, params


def test_proto_roundtrip(attn_model, tmp_path):
    """encode -> decode -> encode is byte-identical (writer/reader agree)."""
    model, params = attn_model
    g = build_unet_graph(model, params)
    blob = g.model().encode()
    reparsed = P.ModelProto.decode(blob)
    assert reparsed.encode() == blob
    assert reparsed.opset_import[0].version == 17
    assert reparsed.ir_version == 8
    names = [vi.name for vi in reparsed.graph.input]
    assert names == ["x", "noise_labels", "cond_0", "cond_1", "cond_2"]
    # dynamic batch dim is a dim_param, spatial dims are static
    x_dims = reparsed.graph.input[0].type.tensor_type.shape.dim
    assert x_dims[0].dim_param == "batch"
    assert [d.dim_value for d in x_dims[1:]] == [3, 16, 16]


def test_tensor_raw_data_roundtrip():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4) - 11.5
    t = P.tensor_from_numpy(arr, "t")
    back = P.tensor_to_numpy(P.TensorProto.decode(t.encode()))
    np.testing.assert_array_equal(back, arr)
    idx = np.array([3, -9, 2**40], dtype=np.int64)
    back_i = P.tensor_to_numpy(P.TensorProto.decode(
        P.tensor_from_numpy(idx, "i").encode()))
    np.testing.assert_array_equal(back_i, idx)


def test_export_matches_jax_attention(attn_model, tmp_path):
    model, params = attn_model
    path = os.path.join(tmp_path, "attn.onnx")
    entry = export_unet(model, params, path, verify=True, verify_tol=1e-3)
    assert entry["verified"]
    assert entry["max_abs_diff"] < 1e-3
    assert entry["output_std"] > 0.0  # non-vacuous comparison


def test_export_matches_jax_mobile(mobile_model, tmp_path):
    model, params = mobile_model
    path = os.path.join(tmp_path, "mobile.onnx")
    entry = export_unet(model, params, path, verify=True, verify_tol=1e-3)
    assert entry["max_abs_diff"] < 1e-3


def test_dynamic_batch(attn_model, tmp_path):
    """The same exported file serves batch 1 and batch 3."""
    model, params = attn_model
    path = os.path.join(tmp_path, "attn.onnx")
    export_unet(model, params, path, verify=False)
    proto = P.load_model(path)
    rng = np.random.default_rng(3)
    for batch in (1, 3):
        feed = {
            "x": rng.standard_normal((batch, 3, 16, 16)).astype(np.float32),
            "noise_labels": rng.standard_normal((batch,)).astype(np.float32),
            "cond_0": rng.standard_normal((batch,)).astype(np.float32),
            "cond_1": rng.standard_normal((batch, 6)).astype(np.float32),
            "cond_2": rng.integers(0, 5, (batch,)).astype(np.int64),
        }
        out = run_model(proto, feed)["output"]
        assert out.shape == (batch, 2, 16, 16)
        assert np.all(np.isfinite(out))


def test_batch_consistency(attn_model, tmp_path):
    """Row i of a batched run equals a singleton run of row i."""
    model, params = attn_model
    path = os.path.join(tmp_path, "attn.onnx")
    export_unet(model, params, path, verify=False)
    proto = P.load_model(path)
    rng = np.random.default_rng(7)
    feed = {
        "x": rng.standard_normal((2, 3, 16, 16)).astype(np.float32),
        "noise_labels": rng.standard_normal((2,)).astype(np.float32),
        "cond_0": rng.standard_normal((2,)).astype(np.float32),
        "cond_1": rng.standard_normal((2, 6)).astype(np.float32),
        "cond_2": rng.integers(0, 5, (2,)).astype(np.int64),
    }
    full = run_model(proto, feed)["output"]
    solo = run_model(proto, {k: v[1:2] for k, v in feed.items()})["output"]
    np.testing.assert_allclose(full[1:2], solo, rtol=1e-5, atol=1e-5)


def test_size_override(attn_model, tmp_path):
    """image_size override (coarse/base export at 64px) changes I/O shapes."""
    model, params = attn_model
    path = os.path.join(tmp_path, "attn32.onnx")
    export_unet(model, params, path, image_size=32, verify=False)
    diff, out_std = verify_export(path, model, params, image_size=32)
    assert diff < 1e-3
    assert out_std > 0.0
    x_dims = P.load_model(path).graph.input[0].type.tensor_type.shape.dim
    assert [d.dim_value for d in x_dims[1:]] == [3, 32, 32]


def test_no_padding_output_shape_declared(tmp_path):
    """VALID convs shrink spatial dims; the declared output must track it.

    no_padding only composes with encode_only nets (the reference uses it
    for GAN discriminators) — with a decoder path the skip concat would
    shape-mismatch in the reference/JAX model too.
    """
    cfg = EDMUnetConfig(
        image_size=16, in_channels=2, model_channels=8,
        model_channel_mults=(1,), layers_per_block=2, encode_only=True,
        midblock_attention=False, logvar_channels=8, fourier_scale="pos",
        block_kwargs={"no_padding": True})
    model = EDMUnet2D(cfg)
    params = model.init(jax.random.PRNGKey(3))
    params["out_gain"] = jnp.asarray(0.9)
    path = os.path.join(tmp_path, "nopad.onnx")
    entry = export_unet(model, params, path, verify=True, verify_tol=1e-3)
    assert entry["max_abs_diff"] < 1e-3
    out_dims = P.load_model(path).graph.output[0].type.tensor_type.shape.dim
    got = [d.dim_value for d in out_dims[1:]]
    # cross-check against the actual JAX output shape
    want = model.apply(params, jnp.zeros((1, 16, 16, 2)), jnp.zeros((1,)), [])
    assert got == [want.shape[3], want.shape[1], want.shape[2]]
    assert got[1] < 16  # it actually shrank


def test_opset_out_of_range_rejected(attn_model, tmp_path):
    model, params = attn_model
    path = os.path.join(tmp_path, "x.onnx")
    for opset in (12, 18):
        with pytest.raises(ValueError, match="opset"):
            export_unet(model, params, path, opset=opset)
    assert not os.path.exists(path)


def test_failed_verify_leaves_no_artifact(attn_model, tmp_path):
    """A verification failure must not leave a stale .onnx behind."""
    model, params = attn_model
    path = os.path.join(tmp_path, "bad.onnx")
    with pytest.raises(AssertionError, match="mismatch"):
        export_unet(model, params, path, verify=True, verify_tol=-1.0)
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".tmp")


def test_large_graph_verifies_via_small_export(attn_model, tmp_path):
    """image_size > 128 verifies through an equivalent 64px export."""
    model, params = attn_model
    path = os.path.join(tmp_path, "big.onnx")
    entry = export_unet(model, params, path, image_size=256, verify=True,
                        verify_tol=1e-3)
    assert entry["verified_at"] == 64
    assert entry["verified"]
    x_dims = P.load_model(path).graph.input[0].type.tensor_type.shape.dim
    assert [d.dim_value for d in x_dims[1:]] == [3, 256, 256]
    assert not os.path.exists(path + ".verify.tmp")


def test_unsupported_resample_type_raises(tmp_path):
    cfg = EDMUnetConfig(
        image_size=8, in_channels=2, model_channels=8,
        model_channel_mults=(1, 1), layers_per_block=1,
        midblock_attention=False, logvar_channels=8,
        block_kwargs={"resample_type": "conv", "resample_filter": 2},
    )
    model = EDMUnet2D(cfg)
    params = model.init(jax.random.PRNGKey(2))
    with pytest.raises(NotImplementedError, match="resample_type"):
        build_unet_graph(model, params)


# ---------------------------------------------------------------------------
# Wire-format fuzz (round 5): the proto writer is consumed by external ONNX
# runtimes we cannot run here, so its encoding must be exercised at every
# boundary the protobuf spec cares about.
# ---------------------------------------------------------------------------

def test_varint_boundaries_roundtrip():
    from terrain_diffusion_tpu.export.onnx_proto import _read_varint, _varint

    cases = [0, 1, 127, 128, 129, (1 << 14) - 1, 1 << 14,
             (1 << 31) - 1, 1 << 31, (1 << 63) - 1,
             -1, -128, -(1 << 31), -(1 << 63)]
    for v in cases:
        buf = _varint(v)
        got, pos = _read_varint(buf, 0)
        assert got == v, f"{v}: decoded {got}"
        assert pos == len(buf), f"{v}: trailing bytes"
        # spec: positive values below 2^7k fit in k bytes; negatives always
        # occupy the full 10 bytes (64-bit two's complement)
        assert len(buf) <= 10


@pytest.mark.parametrize("shape", [(0,), (3, 0, 5), (0, 0), ()])
def test_zero_size_and_scalar_tensors_roundtrip(shape):
    t = P.tensor_from_numpy(np.zeros(shape, np.float32), "z")
    back = P.tensor_to_numpy(P.TensorProto.decode(t.encode()))
    assert back.shape == shape
    assert back.dtype == np.float32


def test_long_and_unicode_strings_roundtrip():
    doc = "x" * 100_000
    name = "weights/éé-中文.0"
    g = P.GraphProto(name=name, doc_string=doc)
    back = P.GraphProto.decode(g.encode())
    assert back.name == name
    assert back.doc_string == doc


def test_every_attribute_type_roundtrips():
    tensor = np.arange(6, dtype=np.float32).reshape(2, 3)
    cases = {
        "b": True,
        "i": 3,
        "i_big": (1 << 62),
        "i_neg": -7,
        "f": 2.5,
        "s": "same",
        "s_long": "y" * 50_000,
        "ints": [1, -1, 1 << 40, -(1 << 40), 0],
        "floats": [0.5, -2.0, 3],  # mixed int/float list -> ATTR_FLOATS
        "strings": ["a", "b" * 1000, ""],
        "t": tensor,
    }
    for name, val in cases.items():
        if isinstance(val, np.ndarray):
            attr = P.make_attribute(name, P.tensor_from_numpy(val, name))
        else:
            attr = P.make_attribute(name, val)
        back = P.attribute_value(P.AttributeProto.decode(attr.encode()))
        if isinstance(val, np.ndarray):
            np.testing.assert_array_equal(back, val)
        elif isinstance(val, bool):
            assert back == int(val)
        elif isinstance(val, list):
            assert back == [float(v) for v in val] if name == "floats" else back == list(val)
        else:
            assert back == val, f"{name}: {back!r} != {val!r}"


def test_model_with_fuzz_payloads_roundtrips(tmp_path):
    """A ModelProto combining all the edge payloads survives a file
    round-trip byte-exactly on re-encode."""
    g = P.GraphProto(
        name="fuzz",
        node=[P.NodeProto(op_type="Identity", input=["a" * 9999], output=["y"],
                          attribute=[P.make_attribute("ints",
                                                      [(1 << 63) - 1, -(1 << 63)])])],
        initializer=[P.tensor_from_numpy(np.zeros((4, 0, 2), np.int64), "e")],
        input=[P.value_info("x", P.FLOAT, [None, "batch", 0, 7])],
        output=[P.value_info("y", P.FLOAT, [1])],
    )
    model = P.ModelProto(ir_version=8, graph=g,
                         opset_import=[P.OperatorSetIdProto(version=17)])
    path = os.path.join(tmp_path, "fuzz.onnx")
    P.save_model(model, path)
    back = P.load_model(path)
    assert back.encode() == model.encode()
    dims = back.graph.input[0].type.tensor_type.shape.dim
    assert dims[1].dim_param == "batch"
    assert dims[2].dim_value in (0, None)  # zero-size dim preserved as absent-or-0
    assert back.graph.node[0].input[0] == "a" * 9999


def test_oversize_initializer_raises_not_truncates():
    """>2 GB initializers cannot be serialized by ANY protobuf parser; the
    writer must refuse loudly.  Uses a zero-stride broadcast view so the
    test never materializes the 2.5 GB."""
    big = np.broadcast_to(np.float32(0.0), ((1 << 29) + (1 << 27),))
    assert big.nbytes > (1 << 31) - 1
    with pytest.raises(ValueError, match="protobuf caps"):
        P.tensor_from_numpy(big, "too_big")
