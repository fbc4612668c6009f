"""Import harness for the reference implementation at /root/reference.

The reference is a torch codebase whose modules import a handful of
third-party packages that are not installed here (diffusers, numba,
torchvision, rasterio, ...).  For parity testing we only need the *math* of
the reference modules, so this package installs minimal, faithful stand-ins
into ``sys.modules`` before importing the real reference sources:

- ``numba.njit``            -> identity decorator (pure-python execution)
- ``diffusers`` config API  -> re-implemented ConfigMixin/register_to_config
- ``torchvision.transforms.functional`` -> resize/gaussian_blur implemented
  on torch.nn.functional with torchvision's exact algorithm (the reference
  only uses BILINEAR resize and gaussian_blur)
- ``infinite_tensor``    -> faithful minimal runtime stand-in
  (``infinite_tensor_standin.py``) so the reference WorldPipeline can
  actually *execute* for end-to-end composition parity tests
- ``pyfastnoiselite``    -> FastNoiseLite facade over our
  `ops/perlin.py` (same published FastNoiseLite algorithm), so the
  reference synthetic-map factory produces the same conditioning fields
  our pipeline computes
- import-only dummies for packages whose symbols are referenced but never
  called in the code paths under test (rasterio, ema_pytorch, skimage)

Everything the tests exercise runs the *reference's own* code on torch.
"""
from __future__ import annotations

import functools
import importlib
import inspect
import math
import sys
import types

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# numba
# ---------------------------------------------------------------------------

def _make_numba_stub():
    mod = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    mod.njit = njit
    mod.jit = njit
    return mod


# ---------------------------------------------------------------------------
# diffusers (ConfigMixin / register_to_config / ModelMixin / SchedulerMixin)
# ---------------------------------------------------------------------------

class _FrozenConfig:
    """Attribute view over a config dict (diffusers FrozenDict semantics)."""

    def __init__(self, d):
        object.__setattr__(self, "_d", d)

    def __getattr__(self, name):
        try:
            return object.__getattribute__(self, "_d")[name]
        except KeyError:
            raise AttributeError(name) from None

    def __getitem__(self, name):
        return self._d[name]

    def __contains__(self, name):
        return name in self._d

    def get(self, name, default=None):
        return self._d.get(name, default)

    def keys(self):
        return self._d.keys()

    def items(self):
        return self._d.items()


def _make_diffusers_stub(torch):
    diffusers = types.ModuleType("diffusers")
    configuration_utils = types.ModuleType("diffusers.configuration_utils")
    models_pkg = types.ModuleType("diffusers.models")
    modeling_utils = types.ModuleType("diffusers.models.modeling_utils")
    utils_pkg = types.ModuleType("diffusers.utils")
    torch_utils = types.ModuleType("diffusers.utils.torch_utils")
    schedulers_pkg = types.ModuleType("diffusers.schedulers")
    scheduling_utils = types.ModuleType("diffusers.schedulers.scheduling_utils")

    class ConfigMixin:
        def register_to_config(self, **kwargs):
            d = getattr(self, "_internal_dict", None)
            if d is None:
                d = {}
                object.__setattr__(self, "_internal_dict", d)
            d.update(kwargs)

        @property
        def config(self):
            return _FrozenConfig(getattr(self, "_internal_dict", {}))

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {}
            for name, param in sig.parameters.items():
                if name == "self":
                    continue
                if param.kind == inspect.Parameter.VAR_KEYWORD:
                    cfg.update(bound.arguments.get(name, {}) or {})
                else:
                    cfg[name] = bound.arguments.get(name)
            # Set before running the body: reference __init__ bodies read
            # self.config and call self.register_to_config(...) overrides.
            object.__setattr__(self, "_internal_dict", dict(cfg))
            init(self, *args, **kwargs)

        return wrapper

    class ModelMixin(torch.nn.Module):
        pass

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None, **kwargs):
            self.prev_sample = prev_sample
            for k, v in kwargs.items():
                setattr(self, k, v)

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(tuple(shape), generator=generator, dtype=dtype)

    configuration_utils.ConfigMixin = ConfigMixin
    configuration_utils.register_to_config = register_to_config
    configuration_utils.FrozenDict = _FrozenConfig
    modeling_utils.ModelMixin = ModelMixin
    torch_utils.randn_tensor = randn_tensor
    scheduling_utils.SchedulerMixin = SchedulerMixin
    scheduling_utils.SchedulerOutput = SchedulerOutput

    diffusers.ConfigMixin = ConfigMixin
    diffusers.ModelMixin = ModelMixin
    diffusers.configuration_utils = configuration_utils
    diffusers.models = models_pkg
    diffusers.utils = utils_pkg
    diffusers.schedulers = schedulers_pkg
    models_pkg.modeling_utils = modeling_utils
    utils_pkg.torch_utils = torch_utils
    schedulers_pkg.scheduling_utils = scheduling_utils

    return {
        "diffusers": diffusers,
        "diffusers.configuration_utils": configuration_utils,
        "diffusers.models": models_pkg,
        "diffusers.models.modeling_utils": modeling_utils,
        "diffusers.utils": utils_pkg,
        "diffusers.utils.torch_utils": torch_utils,
        "diffusers.schedulers": schedulers_pkg,
        "diffusers.schedulers.scheduling_utils": scheduling_utils,
    }


# ---------------------------------------------------------------------------
# torchvision.transforms.functional (BILINEAR resize + gaussian_blur only)
# ---------------------------------------------------------------------------

def _make_torchvision_stub(torch):
    import enum

    F = torch.nn.functional

    class InterpolationMode(enum.Enum):
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    def _as_4d(img):
        lead = 0
        while img.ndim < 4:
            img = img.unsqueeze(0)
            lead += 1
        return img, lead

    def resize(img, size, interpolation=InterpolationMode.BILINEAR,
               max_size=None, antialias=True):
        """torchvision.transforms.functional.resize for float tensors.

        Mirrors torchvision's tensor path: int size = shorter-edge scaling,
        (h, w) = exact; bilinear uses align_corners=False and antialias=True
        (the torchvision>=0.17 default)."""
        h, w = img.shape[-2:]
        if isinstance(size, int) or (isinstance(size, (tuple, list)) and len(size) == 1):
            s = size if isinstance(size, int) else size[0]
            if w < h:
                new_w, new_h = s, int(round(s * h / w))
            else:
                new_h, new_w = s, int(round(s * w / h))
        else:
            new_h, new_w = int(size[0]), int(size[1])
        x, lead = _as_4d(img)
        mode = interpolation.value if isinstance(interpolation, InterpolationMode) else str(interpolation)
        kwargs = {}
        if mode in ("bilinear", "bicubic"):
            kwargs["align_corners"] = False
            kwargs["antialias"] = bool(antialias)
        out = F.interpolate(x, size=(new_h, new_w), mode=mode, **kwargs)
        for _ in range(lead):
            out = out.squeeze(0)
        return out

    def _gaussian_kernel1d(kernel_size, sigma, dtype, device):
        half = (kernel_size - 1) * 0.5
        xs = torch.linspace(-half, half, steps=kernel_size, dtype=dtype, device=device)
        pdf = torch.exp(-0.5 * (xs / sigma) ** 2)
        return pdf / pdf.sum()

    def gaussian_blur(img, kernel_size, sigma):
        """torchvision.transforms.functional.gaussian_blur (tensor path):
        2-D separable gaussian with reflect padding."""
        if isinstance(kernel_size, int):
            ky = kx = kernel_size
        else:
            kx, ky = kernel_size if len(kernel_size) == 2 else (kernel_size[0],) * 2
        if isinstance(sigma, (int, float)):
            sy = sx = float(sigma)
        else:
            sx, sy = (float(sigma[0]), float(sigma[-1]))
        x, lead = _as_4d(img)
        n, c, h, w = x.shape
        k1y = _gaussian_kernel1d(ky, sy, x.dtype, x.device)
        k1x = _gaussian_kernel1d(kx, sx, x.dtype, x.device)
        kernel2d = torch.outer(k1y, k1x)
        kernel = kernel2d.expand(c, 1, ky, kx)
        pad = [kx // 2, kx // 2, ky // 2, ky // 2]
        x = F.pad(x, pad, mode="reflect")
        out = F.conv2d(x, kernel, groups=c)
        for _ in range(lead):
            out = out.squeeze(0)
        return out

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.InterpolationMode = InterpolationMode
    functional.resize = resize
    functional.gaussian_blur = gaussian_blur
    transforms.functional = functional
    transforms.InterpolationMode = InterpolationMode
    tv.transforms = transforms
    return {
        "torchvision": tv,
        "torchvision.transforms": transforms,
        "torchvision.transforms.functional": functional,
    }


# ---------------------------------------------------------------------------
# import-only dummies (symbols referenced at import time, never called)
# ---------------------------------------------------------------------------

def _dummy_module(name, attrs=()):
    mod = types.ModuleType(name)
    for a in attrs:
        setattr(mod, a, type(a, (), {"__init__": lambda self, *ar, **kw: None}))
    return mod


def _make_pyfastnoiselite_stub():
    """FastNoiseLite facade over our first-party Perlin (same published
    algorithm: hash-gradient Perlin, quintic smoothing, FBm w/ fractal
    bounding — `terrain_diffusion_tpu/ops/perlin.py`).  Only the surface the
    reference synthetic-map factory touches (`synthetic_map.py:195-229`)."""
    import enum

    import numpy as np

    from terrain_diffusion_tpu.ops.perlin import perlin_fbm

    class NoiseType(enum.Enum):
        NoiseType_Perlin = "perlin"

    class FractalType(enum.Enum):
        FractalType_FBm = "fbm"

    class FastNoiseLite:
        def __init__(self, seed=1337):
            self.seed = int(seed)
            self.noise_type = NoiseType.NoiseType_Perlin
            self.frequency = 0.01
            self.fractal_type = FractalType.FractalType_FBm
            self.fractal_octaves = 3
            self.fractal_lacunarity = 2.0
            self.fractal_gain = 0.5

        def gen_from_coords(self, coords):
            xs = np.asarray(coords[0], dtype=np.float32).ravel()
            ys = np.asarray(coords[1], dtype=np.float32).ravel()
            return perlin_fbm(self.seed, float(self.frequency),
                              int(self.fractal_octaves),
                              float(self.fractal_lacunarity),
                              float(self.fractal_gain), xs, ys)

    pkg = types.ModuleType("pyfastnoiselite")
    sub = types.ModuleType("pyfastnoiselite.pyfastnoiselite")
    for mod in (pkg, sub):
        mod.FastNoiseLite = FastNoiseLite
        mod.NoiseType = NoiseType
        mod.FractalType = FractalType
    pkg.pyfastnoiselite = sub
    return {"pyfastnoiselite": pkg, "pyfastnoiselite.pyfastnoiselite": sub}


def _make_flask_stub():
    """Import-time surface of flask used by the reference's serving modules
    (`api.py:8`): route decorators are pass-throughs, `Response`/`jsonify`
    capture their payloads.  Only module-level import + decoration runs in
    the parity tests (we call the pure helpers like `_get_terrain` directly,
    never the HTTP layer)."""
    flask = types.ModuleType("flask")

    class Flask:
        def __init__(self, name, **kwargs):
            self.name = name

        def _passthrough(self, *args, **kwargs):
            def deco(fn):
                return fn

            return deco

        get = post = route = errorhandler = _passthrough

        def run(self, *args, **kwargs):  # pragma: no cover
            raise RuntimeError("flask stub cannot serve")

    class Response:
        def __init__(self, response=None, status=200, headers=None,
                     mimetype=None, **kwargs):
            self.response = response
            self.status = status
            self.headers = dict(headers or {})
            self.mimetype = mimetype

    def jsonify(*args, **kwargs):
        return args[0] if args else dict(kwargs)

    flask.Flask = Flask
    flask.Response = Response
    flask.jsonify = jsonify
    flask.request = types.SimpleNamespace(args={})
    return {"flask": flask}


def install_stubs():
    """Idempotently install the reference's missing third-party deps."""
    if "numba" not in sys.modules or not hasattr(sys.modules.get("numba"), "njit"):
        sys.modules["numba"] = _make_numba_stub()

    import torch

    if "diffusers" not in sys.modules:
        sys.modules.update(_make_diffusers_stub(torch))

    try:
        import torchvision.transforms.functional  # noqa: F401
    except ImportError:
        sys.modules.update(_make_torchvision_stub(torch))

    for name, attrs in [
        ("rasterio", ()),
        ("skimage", ()),
        ("ema_pytorch", ("PostHocEMA",)),
    ]:
        try:
            importlib.import_module(name)
        except ImportError:
            sys.modules[name] = _dummy_module(name, attrs)
    if "infinite_tensor" not in sys.modules:
        try:
            importlib.import_module("infinite_tensor")
        except ImportError:
            from . import infinite_tensor_standin
            sys.modules["infinite_tensor"] = infinite_tensor_standin
    if "pyfastnoiselite" not in sys.modules:
        try:
            importlib.import_module("pyfastnoiselite")
        except ImportError:
            sys.modules.update(_make_pyfastnoiselite_stub())
    if "flask" not in sys.modules:
        try:
            importlib.import_module("flask")
        except ImportError:
            sys.modules.update(_make_flask_stub())


def import_reference(dotted: str):
    """Import ``terrain_diffusion.<dotted>`` from the read-only reference."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(f"terrain_diffusion.{dotted}")
