"""JAX LPIPS-Alex vs a literal torch interpretation of the same weights."""
import numpy as np
import pytest

import jax.numpy as jnp

from terrain_diffusion_tpu.nn import lpips as jl

torch = pytest.importorskip("torch")
F = torch.nn.functional


def torch_lpips(state, x0, x1, spatial=True):
    """lpips.LPIPS(net='alex') forward on torch.nn.functional, consuming the
    same torchvision-named state dict."""
    s = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        x = (x - shift) / scale
        out = []
        h = F.relu(F.conv2d(x, s["features.0.weight"], s["features.0.bias"],
                            stride=4, padding=2))
        out.append(h)
        h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, s["features.3.weight"], s["features.3.bias"],
                            padding=2))
        out.append(h)
        h = F.max_pool2d(h, 3, 2)
        h = F.relu(F.conv2d(h, s["features.6.weight"], s["features.6.bias"],
                            padding=1))
        out.append(h)
        h = F.relu(F.conv2d(h, s["features.8.weight"], s["features.8.bias"],
                            padding=1))
        out.append(h)
        h = F.relu(F.conv2d(h, s["features.10.weight"], s["features.10.bias"],
                            padding=1))
        out.append(h)
        return out

    def norm(x):
        return x / torch.sqrt(torch.sum(x**2, dim=1, keepdim=True) + 1e-10)

    t0, t1 = taps(x0), taps(x1)
    total = None
    for k, (f0, f1) in enumerate(zip(t0, t1)):
        d = (norm(f0) - norm(f1)) ** 2
        v = F.conv2d(d, s[f"lin{k}.model.1.weight"])
        if spatial:
            v = F.interpolate(v, size=x0.shape[2:], mode="bilinear",
                              align_corners=False)
        else:
            v = v.mean(dim=(2, 3), keepdim=True)
        total = v if total is None else total + v
    return total


@pytest.fixture(scope="module")
def state():
    return jl.random_torch_state(seed=11)


@pytest.mark.parametrize("spatial", [True, False])
def test_lpips_parity(state, rng, spatial):
    params = jl.params_from_torch_state(state)
    x0 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    x1 = np.clip(x0 + 0.2 * rng.standard_normal(x0.shape).astype(np.float32), -1, 1)
    with torch.no_grad():
        want = torch_lpips(state, torch.from_numpy(x0), torch.from_numpy(x1),
                           spatial=spatial).numpy()
    got = np.asarray(jl.lpips_distance(
        params, jnp.asarray(np.transpose(x0, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(x1, (0, 2, 3, 1))), spatial=spatial))
    if spatial:
        got = np.transpose(got, (0, 3, 1, 2))
    else:
        want = want.reshape(-1)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-12)
    assert err < 1e-4, err


def test_perceptual_fn_matches_reference_normalization(state, rng):
    """The trainer hook reproduces the reference's pre-normalization
    (`trainers/autoencoder.py:98-123`) before the LPIPS call."""
    params = jl.params_from_torch_state(state)
    target = (rng.standard_normal((2, 32, 32, 1)) * 50).astype(np.float32)
    recon = target + rng.standard_normal(target.shape).astype(np.float32) * 5

    fn = jl.make_perceptual_fn(params)
    got = float(fn(jnp.asarray(recon), jnp.asarray(target)))

    t_ref = torch.from_numpy(np.transpose(target, (0, 3, 1, 2)))
    t_rec = torch.from_numpy(np.transpose(recon, (0, 3, 1, 2)))
    ref_min = torch.amin(t_ref, dim=(1, 2, 3), keepdim=True)
    ref_max = torch.amax(t_ref, dim=(1, 2, 3), keepdim=True)
    ref_range = torch.maximum((ref_max - ref_min) * 1.1, torch.tensor(0.1))
    ref_center = (ref_min + ref_max) / 2
    n_ref = ((t_ref - ref_center) / ref_range * 2)
    n_rec = ((t_rec - ref_center) / ref_range * 2).clamp(-1, 1)
    with torch.no_grad():
        want = float(torch_lpips(state, n_ref.repeat(1, 3, 1, 1),
                                 n_rec.repeat(1, 3, 1, 1)).mean())
    assert abs(got - want) / (abs(want) + 1e-12) < 1e-3, (got, want)


def test_gradients_flow(state, rng):
    """The loss is differentiable wrt the reconstruction (training use)."""
    import jax

    params = jl.params_from_torch_state(state)
    fn = jl.make_perceptual_fn(params)
    target = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
    recon = target + 0.1

    g = jax.grad(lambda r: fn(r, target))(recon)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_slice_keyed_state_dict_loads(state, tmp_path):
    """The lpips pip package registers torchvision layers under their
    ORIGINAL indices inside net.sliceN modules — a net.sliceN.<i>.* state
    dict must load identically to features-keyed weights."""
    import torch

    # slice boundaries for alexnet in the lpips package: [0:2][2:5][5:8][8:10][10:12]
    bounds = [(1, range(0, 2)), (2, range(2, 5)), (3, range(5, 8)),
              (4, range(8, 10)), (5, range(10, 12))]
    slice_state = {}
    for k, v in state.items():
        if k.startswith("features."):
            idx = int(k.split(".")[1])
            rest = k.split(".", 2)[2]
            n = next(sn for sn, r in bounds if idx in r)
            k = f"net.slice{n}.{idx}.{rest}"
        slice_state[k] = torch.as_tensor(np.asarray(v))
    path = str(tmp_path / "slice_keyed.pt")
    torch.save(slice_state, path)
    params = jl.load_torch_checkpoint(path)
    ref_params = jl.params_from_torch_state(dict(state))
    import jax

    for (a, b) in zip(jax.tree.leaves(params), jax.tree.leaves(ref_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
