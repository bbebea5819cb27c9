"""Import machinery for using the UNMODIFIED reference modules as numerical
test oracles.

The reference at /root/reference is torch code that imports `diffusers`
(absent in this environment). We inject a minimal stub providing only the
symbols the reference files import at module scope, then load the reference
file directly. No reference code is copied — modules are executed in place
as ground truth for parity tests.
"""

from __future__ import annotations

import enum
import functools
import importlib.util
import inspect
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch.nn as nn

    def _mk(name):
        m = types.ModuleType(name)
        sys.modules[name] = m
        return m

    diffusers = _mk("diffusers")
    cfg_utils = _mk("diffusers.configuration_utils")
    loaders = _mk("diffusers.loaders")
    single_file = _mk("diffusers.loaders.single_file_model")
    models = _mk("diffusers.models")
    autoenc = _mk("diffusers.models.autoencoders")
    vae_mod = _mk("diffusers.models.autoencoders.vae")
    outputs = _mk("diffusers.models.modeling_outputs")
    modeling = _mk("diffusers.models.modeling_utils")
    utils = _mk("diffusers.utils")
    acc = _mk("diffusers.utils.accelerate_utils")

    class ConfigMixin:
        @property
        def config(self):
            return types.SimpleNamespace(**self._internal_dict)

        def register_to_config(self, **kwargs):
            if not hasattr(self, "_internal_dict"):
                self._internal_dict = {}
            self._internal_dict.update(kwargs)

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            self._internal_dict = {
                k: v for k, v in bound.arguments.items() if k != "self"}
            init(self, *args, **kwargs)
        return wrapper

    class FromOriginalModelMixin:
        pass

    class _Out:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class ModelMixin(nn.Module):
        pass

    def apply_forward_hook(fn):
        return fn

    schedulers = _mk("diffusers.schedulers")
    sched_utils = _mk("diffusers.schedulers.scheduling_utils")
    torch_utils = _mk("diffusers.utils.torch_utils")

    class KarrasDiffusionSchedulers(enum.Enum):
        pass

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample=None):
            self.prev_sample = prev_sample

    def deprecate(*args, **kwargs):
        pass

    sched_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    sched_utils.SchedulerMixin = SchedulerMixin
    sched_utils.SchedulerOutput = SchedulerOutput
    schedulers.scheduling_utils = sched_utils
    diffusers.schedulers = schedulers
    utils.deprecate = deprecate
    utils.is_scipy_available = lambda: False
    torch_utils.randn_tensor = None
    utils.torch_utils = torch_utils

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config
    single_file.FromOriginalModelMixin = FromOriginalModelMixin
    vae_mod.DecoderOutput = _Out
    vae_mod.DiagonalGaussianDistribution = object
    outputs.AutoencoderKLOutput = _Out
    modeling.ModelMixin = ModelMixin
    acc.apply_forward_hook = apply_forward_hook
    diffusers.configuration_utils = cfg_utils
    diffusers.loaders = loaders
    loaders.single_file_model = single_file
    diffusers.models = models
    models.autoencoders = autoenc
    autoenc.vae = vae_mod
    models.modeling_outputs = outputs
    models.modeling_utils = modeling
    diffusers.utils = utils
    utils.accelerate_utils = acc


def load_reference_module(relpath: str, name: str):
    """Load a reference python file as a standalone module (no package)."""
    _install_diffusers_stub()
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
