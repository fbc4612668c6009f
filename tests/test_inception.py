"""JAX FID-Inception vs a literal torch interpretation of the same weights.

The torch mirror below implements torchvision's ``inception_v3`` forward
(with the pytorch-fid variant patches) directly on ``torch.nn.functional``,
consuming the SAME torchvision-named state dict as
``evaluation.inception.params_from_torch_state`` — so a layout/wiring error
on either side breaks parity.  Real pretrained weights are not available
offline; random weights exercise every code path identically.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from terrain_diffusion_tpu.evaluation import inception as inc

torch = pytest.importorskip("torch")
F = torch.nn.functional


# ---------------------------------------------------------------------------
# torch mirror
# ---------------------------------------------------------------------------

class TorchMirror:
    def __init__(self, state):
        self.s = {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}

    def conv_bn(self, name, x, stride=1, padding=0):
        y = F.conv2d(x, self.s[f"{name}.conv.weight"], stride=stride,
                     padding=padding)
        y = F.batch_norm(y, self.s[f"{name}.bn.running_mean"],
                         self.s[f"{name}.bn.running_var"],
                         self.s[f"{name}.bn.weight"], self.s[f"{name}.bn.bias"],
                         training=False, eps=inc.BN_EPS)
        return F.relu(y)

    def avg3(self, x):
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    def block_a(self, n, x):
        b1 = self.conv_bn(f"{n}.branch1x1", x)
        b5 = self.conv_bn(f"{n}.branch5x5_2",
                          self.conv_bn(f"{n}.branch5x5_1", x), padding=2)
        bd = self.conv_bn(f"{n}.branch3x3dbl_1", x)
        bd = self.conv_bn(f"{n}.branch3x3dbl_2", bd, padding=1)
        bd = self.conv_bn(f"{n}.branch3x3dbl_3", bd, padding=1)
        bp = self.conv_bn(f"{n}.branch_pool", self.avg3(x))
        return torch.cat([b1, b5, bd, bp], 1)

    def block_b(self, x):
        b3 = self.conv_bn("Mixed_6a.branch3x3", x, stride=2)
        bd = self.conv_bn("Mixed_6a.branch3x3dbl_1", x)
        bd = self.conv_bn("Mixed_6a.branch3x3dbl_2", bd, padding=1)
        bd = self.conv_bn("Mixed_6a.branch3x3dbl_3", bd, stride=2)
        return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)

    def block_c(self, n, x):
        b1 = self.conv_bn(f"{n}.branch1x1", x)
        b7 = self.conv_bn(f"{n}.branch7x7_1", x)
        b7 = self.conv_bn(f"{n}.branch7x7_2", b7, padding=(0, 3))
        b7 = self.conv_bn(f"{n}.branch7x7_3", b7, padding=(3, 0))
        bd = self.conv_bn(f"{n}.branch7x7dbl_1", x)
        bd = self.conv_bn(f"{n}.branch7x7dbl_2", bd, padding=(3, 0))
        bd = self.conv_bn(f"{n}.branch7x7dbl_3", bd, padding=(0, 3))
        bd = self.conv_bn(f"{n}.branch7x7dbl_4", bd, padding=(3, 0))
        bd = self.conv_bn(f"{n}.branch7x7dbl_5", bd, padding=(0, 3))
        bp = self.conv_bn(f"{n}.branch_pool", self.avg3(x))
        return torch.cat([b1, b7, bd, bp], 1)

    def block_d(self, x):
        b3 = self.conv_bn("Mixed_7a.branch3x3_1", x)
        b3 = self.conv_bn("Mixed_7a.branch3x3_2", b3, stride=2)
        b7 = self.conv_bn("Mixed_7a.branch7x7x3_1", x)
        b7 = self.conv_bn("Mixed_7a.branch7x7x3_2", b7, padding=(0, 3))
        b7 = self.conv_bn("Mixed_7a.branch7x7x3_3", b7, padding=(3, 0))
        b7 = self.conv_bn("Mixed_7a.branch7x7x3_4", b7, stride=2)
        return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    def block_e(self, n, x, pool):
        b1 = self.conv_bn(f"{n}.branch1x1", x)
        b3 = self.conv_bn(f"{n}.branch3x3_1", x)
        b3 = torch.cat([
            self.conv_bn(f"{n}.branch3x3_2a", b3, padding=(0, 1)),
            self.conv_bn(f"{n}.branch3x3_2b", b3, padding=(1, 0))], 1)
        bd = self.conv_bn(f"{n}.branch3x3dbl_1", x)
        bd = self.conv_bn(f"{n}.branch3x3dbl_2", bd, padding=1)
        bd = torch.cat([
            self.conv_bn(f"{n}.branch3x3dbl_3a", bd, padding=(0, 1)),
            self.conv_bn(f"{n}.branch3x3dbl_3b", bd, padding=(1, 0))], 1)
        pooled = (F.max_pool2d(x, 3, 1, 1) if pool == "max" else self.avg3(x))
        bp = self.conv_bn(f"{n}.branch_pool", pooled)
        return torch.cat([b1, b3, bd, bp], 1)

    def features(self, x):
        x = self.conv_bn("Conv2d_1a_3x3", x, stride=2)
        x = self.conv_bn("Conv2d_2a_3x3", x)
        x = self.conv_bn("Conv2d_2b_3x3", x, padding=1)
        x = F.max_pool2d(x, 3, 2)
        x = self.conv_bn("Conv2d_3b_1x1", x)
        x = self.conv_bn("Conv2d_4a_3x3", x)
        x = F.max_pool2d(x, 3, 2)
        for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = self.block_a(n, x)
        x = self.block_b(x)
        for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = self.block_c(n, x)
        x = self.block_d(x)
        x = self.block_e("Mixed_7b", x, "avg")
        x = self.block_e("Mixed_7c", x, "max")
        return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def state():
    return inc.random_torch_state(seed=3)


def test_feature_parity(state, rng):
    params = inc.params_from_torch_state(state)
    mirror = TorchMirror(state)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        want = mirror.features(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = np.asarray(inc.apply(params, jnp.asarray(x)))
    assert got.shape == (2, inc.FEATURE_DIM)
    err = np.sqrt(np.mean((got - want.numpy()) ** 2)) / (np.sqrt(np.mean(want.numpy() ** 2)) + 1e-12)
    assert err < 1e-3, err


def test_resize_matches_torch_interpolate(rng):
    x = rng.standard_normal((1, 64, 80, 3)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                         size=(299, 299), mode="bilinear",
                         align_corners=False).numpy()
    got = np.transpose(
        np.asarray(inc.resize_bilinear_no_aa(jnp.asarray(x), (299, 299))),
        (0, 3, 1, 2))
    # f32 weight-computation rounding differs slightly; 1e-4 abs is ~3 ulp
    # of the interpolated values here
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_metric_pipeline_with_inception_features(state, rng):
    """compute_kid/compute_fid run end-to-end on the inception feature fn."""
    from terrain_diffusion_tpu.evaluation.metrics import compute_fid, compute_kid

    params = inc.params_from_torch_state(state)
    fn = inc.make_feature_fn(params)
    real = rng.uniform(0, 255, (8, 64, 64, 1)).astype(np.float32)
    fake = rng.uniform(0, 255, (8, 64, 64, 1)).astype(np.float32)
    k_mean, k_std = compute_kid(real, fake, feature_fn=fn, batch=4,
                                n_subsets=4, subset_size=4)
    assert np.isfinite(k_mean) and np.isfinite(k_std)
    fid_self = compute_fid(real, real, feature_fn=fn, batch=4)
    assert abs(fid_self) < 1e-4  # identical sets -> 0
