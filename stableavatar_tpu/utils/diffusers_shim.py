"""Minimal `diffusers` shim for importing reference torch modules.

This environment has torch/transformers but not diffusers.  The parity
harness (scripts/parity_vs_torch.py) and the solver parity tests import
reference modules (`wan/models/wan_fantasy_transformer3d_1B.py`,
`wan/utils/fm_solvers*.py`) that depend on a handful of diffusers mixins and
helpers.  `ensure_diffusers()` installs stand-ins in sys.modules ONLY when
the real package is absent — on a deployment machine with diffusers
installed, the real one is used untouched.

Shimmed surface (exactly what the reference model/solver files touch):
- configuration_utils.ConfigMixin / register_to_config
- loaders.single_file_model.FromOriginalModelMixin
- models.modeling_utils.ModelMixin (nn.Module + .dtype/.device)
- schedulers.scheduling_utils.{KarrasDiffusionSchedulers, SchedulerMixin,
  SchedulerOutput}
- utils.{is_torch_version, logging, deprecate, is_scipy_available,
  BaseOutput}
- utils.torch_utils.randn_tensor
"""

from __future__ import annotations

import functools
import inspect
import logging as _pylogging
import sys
import types


def ensure_diffusers():
    try:
        import diffusers  # noqa: F401

        return sys.modules["diffusers"]
    except ImportError:
        pass
    if "diffusers" in sys.modules:
        return sys.modules["diffusers"]

    import torch

    class FrozenDict(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as e:
                raise AttributeError(name) from e

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            object.__setattr__(self, "_internal_dict", FrozenDict(cfg))
            init(self, *args, **kwargs)

        return wrapper

    class ConfigMixin:
        @property
        def config(self):
            return getattr(self, "_internal_dict", FrozenDict())

        @classmethod
        def from_config(cls, config, **kwargs):
            cfg = dict(config)
            cfg.update(kwargs)
            return cls(**cfg)

    class ModelMixin(torch.nn.Module):
        @property
        def dtype(self):
            try:
                return next(self.parameters()).dtype
            except StopIteration:
                return torch.float32

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

        def enable_gradient_checkpointing(self):
            self.gradient_checkpointing = True

    class FromOriginalModelMixin:
        pass

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

        def __getitem__(self, i):
            return (self.prev_sample,)[i]

    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        """Empty stand-in for the real enum (iterated for _compatibles)."""

    class BaseOutput(dict):
        def __init__(self, **kwargs):
            super().__init__(**kwargs)
            for k, v in kwargs.items():
                setattr(self, k, v)

        def __getitem__(self, i):
            if isinstance(i, int):
                return list(self.values())[i]
            return super().__getitem__(i)

    def is_torch_version(op, version):
        from packaging.version import Version

        cur = Version(torch.__version__.split("+")[0])
        ref = Version(version)
        return {
            ">=": cur >= ref, ">": cur > ref, "<=": cur <= ref,
            "<": cur < ref, "==": cur == ref, "!=": cur != ref,
        }[op]

    def deprecate(*args, **kwargs):
        return None

    def is_scipy_available():
        try:
            import scipy  # noqa: F401

            return True
        except ImportError:
            return False

    def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
        if isinstance(generator, list):
            generator = generator[0]
        return torch.randn(
            shape, generator=generator, device="cpu", dtype=dtype
        ).to(device or "cpu")

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            return _pylogging.getLogger(name or "diffusers")

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    root = mod("diffusers")
    root.__path__ = []  # mark as package
    cfgmod = mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin,
        register_to_config=register_to_config,
        FrozenDict=FrozenDict,
    )
    mod("diffusers.loaders")
    mod("diffusers.loaders.single_file_model", FromOriginalModelMixin=FromOriginalModelMixin)
    mod("diffusers.models")
    mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    mod("diffusers.schedulers")
    mod(
        "diffusers.schedulers.scheduling_utils",
        KarrasDiffusionSchedulers=KarrasDiffusionSchedulers,
        SchedulerMixin=SchedulerMixin,
        SchedulerOutput=SchedulerOutput,
    )
    utils = mod(
        "diffusers.utils",
        is_torch_version=is_torch_version,
        logging=_Logging(),
        deprecate=deprecate,
        is_scipy_available=is_scipy_available,
        BaseOutput=BaseOutput,
        WEIGHTS_NAME="diffusion_pytorch_model.bin",
    )
    mod("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    root.configuration_utils = cfgmod
    root.utils = utils
    return root
