"""Minimal `diffusers` shim for importing reference torch modules.

This environment has torch/transformers but not diffusers.  The parity
harness (scripts/parity_vs_torch.py) and the solver parity tests import
reference modules (`wan/models/wan_fantasy_transformer3d_1B.py`,
`wan/utils/fm_solvers*.py`) that depend on a handful of diffusers mixins and
helpers.  `ensure_diffusers()` installs stand-ins in sys.modules ONLY when
the real package is absent — on a deployment machine with diffusers
installed, the real one is used untouched.

Shimmed surface (exactly what the reference model/solver/pipeline files touch):
- configuration_utils.ConfigMixin / register_to_config
- loaders.single_file_model.FromOriginalModelMixin
- models.modeling_utils.ModelMixin (nn.Module + .dtype/.device)
- schedulers.scheduling_utils.{KarrasDiffusionSchedulers, SchedulerMixin,
  SchedulerOutput}
- utils.{is_torch_version, logging, deprecate, is_scipy_available,
  BaseOutput, replace_example_docstring}
- utils.torch_utils.randn_tensor
- **FlowMatchEulerDiscreteScheduler** — a first-party torch implementation
  of the flow-match Euler schedule (same derivation as our
  `schedulers/flow_match.py`, whose sigma construction is verified against
  the published diffusers algorithm in tests/test_scheduler.py), so the
  ACTUAL reference pipelines can execute without diffusers
- pipelines.pipeline_utils.DiffusionPipeline (register_modules,
  _execution_device, progress_bar, maybe_free_model_hooks)
- models.autoencoders.vae.{DecoderOutput, DiagonalGaussianDistribution},
  models.modeling_outputs.AutoencoderKLOutput,
  utils.accelerate_utils.apply_forward_hook
- image_processor.VaeImageProcessor / video_processor.VideoProcessor
  (torch-tensor preprocess paths the Wan pipelines hit)
- callbacks.{MultiPipelineCallbacks, PipelineCallback},
  models.embeddings.get_1d_rotary_pos_embed
"""

from __future__ import annotations

import functools
import inspect
import logging as _pylogging
import sys
import types


def ensure_torchvision():
    """Shim the tiny torchvision surface the reference files import
    (`wan_image_encoder.py:463-467` transforms, `TF.to_tensor`,
    `torchvision.utils.make_grid/save_image`)."""
    try:
        import torchvision  # noqa: F401

        return sys.modules["torchvision"]
    except ImportError:
        pass
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]

    import enum

    import numpy as np
    import torch

    class InterpolationMode(enum.Enum):
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    def to_tensor(pic):
        if isinstance(pic, torch.Tensor):
            return pic
        arr = np.array(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
        if t.dtype == torch.uint8:
            t = t.float().div(255)
        return t

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, interpolation=InterpolationMode.BILINEAR, **kw):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, x):
            if isinstance(x, torch.Tensor):
                mode = getattr(self.interpolation, "value", "bilinear")
                unsq = x.ndim == 3
                if unsq:
                    x = x[None]
                # torch rejects align_corners for nearest/area modes
                ac = (
                    False
                    if mode in ("linear", "bilinear", "bicubic", "trilinear")
                    else None
                )
                out = torch.nn.functional.interpolate(
                    x, size=tuple(self.size), mode=mode, align_corners=ac
                )
                return out[0] if unsq else out
            return x.resize(tuple(self.size)[::-1])  # PIL takes (w, h)

    class ToTensor:
        def __call__(self, x):
            return to_tensor(x)

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean)
            self.std = torch.tensor(std)

        def __call__(self, x):
            shape = (-1,) + (1,) * (x.ndim - 1 - (x.ndim == 4))
            m = self.mean.view(shape).to(x.dtype)
            s = self.std.view(shape).to(x.dtype)
            if x.ndim == 4:
                m, s = m[None], s[None]
            return (x - m) / s

    def make_grid(tensor, nrow=8, padding=2, normalize=False, value_range=None, **kw):
        if isinstance(tensor, list):
            tensor = torch.stack(tensor)
        if tensor.ndim == 3:
            tensor = tensor[None]
        b, c, h, w = tensor.shape
        ncol = min(nrow, b)
        nrows = (b + ncol - 1) // ncol
        grid = tensor.new_zeros(c, nrows * (h + padding) + padding, ncol * (w + padding) + padding)
        for i in range(b):
            r, col = divmod(i, ncol)
            grid[:, padding + r * (h + padding): padding + r * (h + padding) + h,
                 padding + col * (w + padding): padding + col * (w + padding) + w] = tensor[i]
        return grid

    def save_image(tensor, fp, **kw):
        import cv2

        grid = make_grid(tensor, **kw)
        arr = (grid.clamp(0, 1) * 255).byte().cpu().numpy().transpose(1, 2, 0)
        cv2.imwrite(str(fp), cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))

    def mod(name, **attrs):
        import importlib.machinery

        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    root = mod("torchvision")
    root.__path__ = []
    root.__version__ = "0.20.0"
    tmod = mod(
        "torchvision.transforms",
        Compose=Compose,
        Resize=Resize,
        ToTensor=ToTensor,
        Normalize=Normalize,
        InterpolationMode=InterpolationMode,
    )
    fmod = mod(
        "torchvision.transforms.functional",
        to_tensor=to_tensor,
        InterpolationMode=InterpolationMode,
    )
    tmod.functional = fmod
    umod = mod("torchvision.utils", make_grid=make_grid, save_image=save_image)
    root.transforms = tmod
    root.utils = umod
    return root


def ensure_skimage():
    """Shim `skimage.color.rgb2lab/lab2rgb` (imported by the reference's
    `wan/utils/color_correction.py:3`) with our first-party LAB conversions
    (`stableavatar_tpu/utils/color_correction.py`)."""
    try:
        import skimage  # noqa: F401

        return sys.modules["skimage"]
    except ImportError:
        pass
    if "skimage" in sys.modules:
        return sys.modules["skimage"]

    import importlib.machinery

    from stableavatar_tpu.utils.color_correction import lab_to_rgb, rgb_to_lab

    root = types.ModuleType("skimage")
    root.__spec__ = importlib.machinery.ModuleSpec("skimage", None)
    root.__path__ = []
    color = types.ModuleType("skimage.color")
    color.__spec__ = importlib.machinery.ModuleSpec("skimage.color", None)
    color.rgb2lab = rgb_to_lab
    color.lab2rgb = lab_to_rgb
    root.color = color
    sys.modules["skimage"] = root
    sys.modules["skimage.color"] = color
    return root


def ensure_diffusers():
    ensure_torchvision()
    ensure_skimage()
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

        def __getattr__(self, name):
            # real diffusers resolves direct config-attribute access (e.g.
            # `vae.spacial_compression_ratio`, hit by
            # wan_inference_pipeline_fantasy.py:188-193) with a deprecation
            # warning; reproduce the fallback
            d = self.__dict__.get("_internal_dict")
            if d is not None and name in d:
                return d[name]
            raise AttributeError(
                f"'{type(self).__name__}' object has no attribute '{name}'"
            )

        @classmethod
        def from_config(cls, config, **kwargs):
            cfg = dict(config)
            cfg.update(kwargs)
            return cls(**cfg)

    class ModelMixin(torch.nn.Module):
        def __getattr__(self, name):
            # nn.Module.__getattr__ wins the MRO over ConfigMixin's; real
            # diffusers' ModelMixin chains to the config fallback — mirror it
            try:
                return super().__getattr__(name)
            except AttributeError:
                d = self.__dict__.get("_internal_dict")
                if d is not None and name in d:
                    return d[name]
                raise

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

    def replace_example_docstring(example):
        def deco(fn):
            return fn

        return deco

    # --- flow-match Euler scheduler (first-party; derivation matches our
    # schedulers/flow_match.py, which is verified in tests/test_scheduler.py
    # and exercised step-for-step by tests/test_pipeline_parity.py) ---

    class FlowMatchEulerDiscreteScheduler(SchedulerMixin, ConfigMixin):
        order = 1

        @register_to_config
        def __init__(
            self,
            num_train_timesteps=1000,
            shift=1.0,
            use_dynamic_shifting=False,
            base_shift=0.5,
            max_shift=1.15,
            base_image_seq_len=256,
            max_image_seq_len=4096,
        ):
            sigmas = (
                torch.linspace(1, num_train_timesteps, num_train_timesteps)
                .flip(0)
                / num_train_timesteps
            )
            if not use_dynamic_shifting:
                sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
            self.timesteps = sigmas * num_train_timesteps
            self.sigmas = sigmas
            self.sigma_min = float(sigmas[-1])
            self.sigma_max = float(sigmas[0])
            self._step_index = None
            self._begin_index = None

        @property
        def step_index(self):
            return self._step_index

        @property
        def begin_index(self):
            return self._begin_index

        def time_shift(self, mu, sigma, t):
            import math

            return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)

        def set_timesteps(
            self, num_inference_steps=None, device=None, sigmas=None, mu=None
        ):
            if self.config.use_dynamic_shifting and mu is None:
                raise ValueError("mu required when use_dynamic_shifting=True")
            if sigmas is None:
                import numpy as _np

                # real diffusers builds the grid with float64 numpy linspace
                timesteps = torch.from_numpy(
                    _np.linspace(
                        self.sigma_max * self.config.num_train_timesteps,
                        self.sigma_min * self.config.num_train_timesteps,
                        num_inference_steps,
                    )
                )
                sigmas = (timesteps / self.config.num_train_timesteps).to(torch.float32)
            else:
                sigmas = torch.as_tensor(sigmas, dtype=torch.float32)
            if self.config.use_dynamic_shifting:
                sigmas = self.time_shift(mu, 1.0, sigmas)
            else:
                shift = self.config.shift
                sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
            self.timesteps = (sigmas * self.config.num_train_timesteps).to(
                device=device, dtype=torch.float32
            )
            self.sigmas = torch.cat(
                [sigmas, torch.zeros(1, device=sigmas.device)]
            ).to(device=device)
            self.num_inference_steps = len(self.timesteps)
            self._step_index = None
            self._begin_index = None

        def index_for_timestep(self, timestep, schedule_timesteps=None):
            if schedule_timesteps is None:
                schedule_timesteps = self.timesteps
            indices = (schedule_timesteps == timestep).nonzero()
            pos = 1 if len(indices) > 1 else 0
            return indices[pos].item()

        def _init_step_index(self, timestep):
            if self._begin_index is None:
                if isinstance(timestep, torch.Tensor):
                    timestep = timestep.to(self.timesteps.device)
                self._step_index = self.index_for_timestep(timestep)
            else:
                self._step_index = self._begin_index

        def step(
            self,
            model_output,
            timestep,
            sample,
            s_churn=0.0,
            s_tmin=0.0,
            s_tmax=float("inf"),
            s_noise=1.0,
            generator=None,
            return_dict=True,
        ):
            if self._step_index is None:
                self._init_step_index(timestep)
            sample = sample.to(torch.float32)
            sigma = self.sigmas[self._step_index]
            sigma_next = self.sigmas[self._step_index + 1]
            prev_sample = sample + (sigma_next - sigma) * model_output.to(torch.float32)
            prev_sample = prev_sample.to(model_output.dtype)
            self._step_index += 1
            if not return_dict:
                return (prev_sample,)
            return SchedulerOutput(prev_sample=prev_sample)

        def scale_noise(self, sample, timestep, noise):
            self._init_step_index(timestep)
            sigma = self.sigmas[self._step_index]
            return sigma * noise + (1.0 - sigma) * sample

        def __len__(self):
            return self.config.num_train_timesteps

    # --- pipeline base + VAE outputs + processors ---

    class DiffusionPipeline(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self._modules_registry = {}

        def register_modules(self, **kwargs):
            for name, module in kwargs.items():
                self._modules_registry[name] = module
                object.__setattr__(self, name, module)

        @property
        def _execution_device(self):
            return torch.device("cpu")

        @property
        def components(self):
            return dict(self._modules_registry)

        def progress_bar(self, total=None):
            from tqdm import tqdm

            return tqdm(total=total, disable=True)

        def maybe_free_model_hooks(self):
            pass

        def enable_model_cpu_offload(self, *a, **k):
            pass

        def to(self, *a, **k):
            return self

    class DiagonalGaussianDistribution:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)
            self.logvar = torch.clamp(self.logvar, -30.0, 20.0)
            self.deterministic = deterministic
            self.std = torch.exp(0.5 * self.logvar)
            self.var = torch.exp(self.logvar)

        def sample(self, generator=None):
            noise = torch.randn(
                self.mean.shape, generator=generator, dtype=self.mean.dtype
            )
            return self.mean + self.std * noise

        def mode(self):
            return self.mean

    class DecoderOutput(BaseOutput):
        def __init__(self, sample=None, **kw):
            super().__init__(sample=sample, **kw)

    class AutoencoderKLOutput(BaseOutput):
        def __init__(self, latent_dist=None, **kw):
            super().__init__(latent_dist=latent_dist, **kw)

    def apply_forward_hook(fn):
        return fn

    class VaeImageProcessor:
        def __init__(
            self,
            vae_scale_factor=8,
            do_normalize=True,
            do_binarize=False,
            do_convert_grayscale=False,
            **kw,
        ):
            self.vae_scale_factor = vae_scale_factor
            self.do_normalize = do_normalize
            self.do_binarize = do_binarize
            self.do_convert_grayscale = do_convert_grayscale

        def preprocess(self, image, height=None, width=None):
            # torch-tensor path (what the Wan pipelines feed: [BF, C, H, W]
            # floats in [0,1] for images, {0,255} for masks)
            if not isinstance(image, torch.Tensor):
                raise NotImplementedError("shim VaeImageProcessor: tensor input only")
            x = image.float()
            if self.do_convert_grayscale and x.ndim == 4 and x.shape[1] == 3:
                x = x.mean(dim=1, keepdim=True)
            if height is not None and width is not None and x.shape[-2:] != (height, width):
                x = torch.nn.functional.interpolate(x, size=(height, width), mode="bilinear")
            if self.do_normalize:
                x = 2.0 * x - 1.0
            if self.do_binarize:
                x = (x >= 0.5).float()
            return x

        def postprocess(self, image, output_type="np"):
            x = (image / 2 + 0.5).clamp(0, 1)
            return x.cpu().float().numpy()

    class VideoProcessor(VaeImageProcessor):
        def postprocess_video(self, video, output_type="np"):
            raise NotImplementedError(
                "shim VideoProcessor only supports output_type='numpy'/'latent'"
            )

    class PipelineCallback:
        pass

    class MultiPipelineCallbacks:
        pass

    def get_1d_rotary_pos_embed(
        dim, pos, theta=10000.0, use_real=False,
        linear_factor=1.0, ntk_factor=1.0, repeat_interleave_real=True, freqs_dtype=torch.float32,
    ):
        if isinstance(pos, int):
            pos = torch.arange(pos)
        if isinstance(pos, (list, tuple)):
            pos = torch.tensor(pos)
        theta = theta * ntk_factor
        freqs = 1.0 / (
            theta ** (torch.arange(0, dim, 2, dtype=freqs_dtype)[: dim // 2] / dim)
        ) / linear_factor
        freqs = torch.outer(pos.to(freqs_dtype), freqs)
        if use_real and repeat_interleave_real:
            return freqs.cos().repeat_interleave(2, dim=1).float(), freqs.sin().repeat_interleave(2, dim=1).float()
        if use_real:
            return torch.cat([freqs.cos(), freqs.cos()], dim=-1).float(), torch.cat(
                [freqs.sin(), freqs.sin()], dim=-1
            ).float()
        return torch.polar(torch.ones_like(freqs), freqs)

    def mod(name, **attrs):
        import importlib.machinery

        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    root = mod("diffusers", FlowMatchEulerDiscreteScheduler=FlowMatchEulerDiscreteScheduler)
    root.__path__ = []  # mark as package
    root.__version__ = "0.31.0"
    cfgmod = mod(
        "diffusers.configuration_utils",
        ConfigMixin=ConfigMixin,
        register_to_config=register_to_config,
        FrozenDict=FrozenDict,
    )
    mod("diffusers.loaders")
    mod("diffusers.loaders.single_file_model", FromOriginalModelMixin=FromOriginalModelMixin)
    mod("diffusers.models", embeddings=None)
    mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    mod("diffusers.models.modeling_outputs", AutoencoderKLOutput=AutoencoderKLOutput)
    mod("diffusers.models.autoencoders")
    mod(
        "diffusers.models.autoencoders.vae",
        DecoderOutput=DecoderOutput,
        DiagonalGaussianDistribution=DiagonalGaussianDistribution,
    )
    mod("diffusers.models.embeddings", get_1d_rotary_pos_embed=get_1d_rotary_pos_embed)
    mod(
        "diffusers.schedulers",
        FlowMatchEulerDiscreteScheduler=FlowMatchEulerDiscreteScheduler,
    )
    mod(
        "diffusers.schedulers.scheduling_utils",
        KarrasDiffusionSchedulers=KarrasDiffusionSchedulers,
        SchedulerMixin=SchedulerMixin,
        SchedulerOutput=SchedulerOutput,
    )
    mod("diffusers.pipelines")
    mod("diffusers.pipelines.pipeline_utils", DiffusionPipeline=DiffusionPipeline)
    mod(
        "diffusers.callbacks",
        PipelineCallback=PipelineCallback,
        MultiPipelineCallbacks=MultiPipelineCallbacks,
    )
    mod("diffusers.image_processor", VaeImageProcessor=VaeImageProcessor)
    mod("diffusers.video_processor", VideoProcessor=VideoProcessor)
    utils = mod(
        "diffusers.utils",
        is_torch_version=is_torch_version,
        logging=_Logging(),
        deprecate=deprecate,
        is_scipy_available=is_scipy_available,
        BaseOutput=BaseOutput,
        replace_example_docstring=replace_example_docstring,
        WEIGHTS_NAME="diffusion_pytorch_model.bin",
    )
    mod("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    mod("diffusers.utils.accelerate_utils", apply_forward_hook=apply_forward_hook)
    root.configuration_utils = cfgmod
    root.utils = utils
    return root
