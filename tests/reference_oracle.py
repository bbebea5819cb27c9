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
import importlib.machinery
import importlib.util
import inspect
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    """A stub with a real ModuleSpec: `importlib.util.find_spec` raises
    `ValueError: <mod>.__spec__ is None` for bare ModuleType entries in
    sys.modules — transformers probes torchvision availability that way,
    so a spec-less stub broke every LATER transformers-based oracle in
    the same process (dav2/zoe ERRORs in full-suite runs)."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch.nn as nn

    def _mk(name):
        m = _stub_module(name)
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


def load_reference_pipelines():
    """Load the reference `pipelines.py` (camera/object-motion/rasterizer
    oracle) with its heavy external deps stubbed: FLUX/depth models,
    DELTA/MoGe/Pi3 submodules (empty dirs in the snapshot anyway),
    torchvision, moviepy. Geometry helpers (se3_inverse) get real numpy
    implementations so the pose math actually runs."""
    _install_diffusers_stub()
    import numpy as _np

    def _mk(name):
        if name in sys.modules:
            return sys.modules[name]
        m = _stub_module(name)
        sys.modules[name] = m
        return m

    diffusers = sys.modules["diffusers"]
    for attr in ("FluxControlPipeline", "CogVideoXDPMScheduler"):
        if not hasattr(diffusers, attr):
            setattr(diffusers, attr, object)
    utils = sys.modules["diffusers.utils"]
    for attr in ("export_to_video", "load_image", "load_video"):
        if not hasattr(utils, attr):
            setattr(utils, attr, lambda *a, **k: None)

    tv = _mk("torchvision")
    tv_tf = _mk("torchvision.transforms")
    tv.transforms = tv_tf

    for name in ("submodules", "submodules.MoGe", "submodules.MoGe.moge",
                 "submodules.MoGe.moge.model", "submodules.MoGe.moge.model.v2",
                 "submodules.DELTA", "submodules.DELTA.densetrack3d",
                 "submodules.DELTA.densetrack3d.models",
                 "submodules.DELTA.densetrack3d.models.densetrack3d",
                 "submodules.DELTA.densetrack3d.models.densetrack3d.densetrack3d",
                 "submodules.DELTA.densetrack3d.models.predictor",
                 "submodules.DELTA.densetrack3d.models.predictor.dense_predictor"):
        _mk(name)
    sys.modules["submodules.MoGe.moge.model.v2"].MoGeModel = object
    sys.modules["submodules.DELTA.densetrack3d.models.densetrack3d"
                ".densetrack3d"].DenseTrack3D = object
    sys.modules["submodules.DELTA.densetrack3d.models.predictor"
                ".dense_predictor"].DensePredictor3D = object

    pi3 = _mk("pi3")
    pi3_utils = _mk("pi3.utils")
    pi3_basic = _mk("pi3.utils.basic")
    pi3_models = _mk("pi3.models")
    pi3_pi3 = _mk("pi3.models.pi3")
    pi3_geom = _mk("pi3.utils.geometry")
    pi3_basic.load_images_as_tensor = lambda *a, **k: None
    pi3_pi3.Pi3 = object

    def se3_inverse(mat):
        out = _np.eye(4, dtype=mat.dtype if hasattr(mat, "dtype")
                      else _np.float64)
        m = _np.asarray(mat)
        out[:3, :3] = m[:3, :3].T
        out[:3, 3] = -m[:3, :3].T @ m[:3, 3]
        return out

    pi3_geom.se3_inverse = se3_inverse
    pi3.utils = pi3_utils
    pi3.models = pi3_models
    pi3_utils.basic = pi3_basic
    pi3_utils.geometry = pi3_geom
    pi3_models.pi3 = pi3_pi3

    iga = _mk("image_gen_aux")
    iga.DepthPreprocessor = object
    moviepy = _mk("moviepy")
    moviepy_editor = _mk("moviepy.editor")
    moviepy_editor.ImageSequenceClip = object
    moviepy.editor = moviepy_editor

    return load_reference_module("pipelines.py", "ref_pipelines")


def load_reference_dit():
    """Load the UNMODIFIED reference FlexAM DiT
    (`FlexAM/models/wan_transformer3d_FlexAM.py`) as a package with its
    absent `FlexAM.dist` sequence-parallel module stubbed (it is missing
    from the release; SURVEY.md L1). SDPA fallback handles attention on
    CPU torch."""
    _install_diffusers_stub()

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv_tf = _stub_module("torchvision.transforms")

        class _Normalize:
            def __init__(self, mean=None, std=None):
                self.mean, self.std = mean, std

        class _Compose:
            def __init__(self, transforms):
                self.transforms = transforms

        for name in ("Normalize", "Resize", "CenterCrop", "ToTensor"):
            setattr(tv_tf, name, _Normalize)
        tv_tf.Compose = _Compose
        tv_tf.InterpolationMode = types.SimpleNamespace(BICUBIC=3)
        tv.transforms = tv_tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_tf

    utils_diff = sys.modules["diffusers.utils"]
    if not hasattr(utils_diff, "is_torch_version"):
        import torch
        from packaging import version as pver

        def is_torch_version(op, ver):
            cur = pver.parse(torch.__version__.split("+")[0])
            ref = pver.parse(ver)
            return {"<": cur < ref, "<=": cur <= ref, ">": cur > ref,
                    ">=": cur >= ref, "==": cur == ref}[op]

        class _Logging:
            @staticmethod
            def get_logger(name):
                import logging as _l
                return _l.getLogger(name)

        utils_diff.is_torch_version = is_torch_version
        utils_diff.logging = _Logging()

    if "FlexAM" not in sys.modules:
        pkg = _stub_module("FlexAM")
        pkg.__path__ = []
        sys.modules["FlexAM"] = pkg
        dist = _stub_module("FlexAM.dist")
        for fname in ("get_sequence_parallel_rank",
                      "get_sequence_parallel_world_size", "get_sp_group",
                      "usp_attn_forward", "xFuserLongContextAttention"):
            setattr(dist, fname, lambda *a, **k: None)
        sys.modules["FlexAM.dist"] = dist

        cfg_opt = load_reference_module("FlexAM/utils/cfg_optimization.py",
                                        "FlexAM_cfg_optimization")
        utils_pkg = _stub_module("FlexAM.utils")
        utils_pkg.cfg_skip = cfg_opt.cfg_skip
        sys.modules["FlexAM.utils"] = utils_pkg

        models_pkg = _stub_module("FlexAM.models")
        models_pkg.__path__ = []
        sys.modules["FlexAM.models"] = models_pkg
        for mod in ("attention_utils", "cache_utils", "wan_camera_adapter"):
            loaded = _load_as_submodule(
                f"FlexAM/models/{mod}.py", f"FlexAM.models.{mod}")
            setattr(models_pkg, mod, loaded)

    return _load_as_submodule(
        "FlexAM/models/wan_transformer3d_FlexAM.py",
        "FlexAM.models.wan_transformer3d_FlexAM")


def _load_as_submodule(relpath: str, dotted: str):
    if dotted in sys.modules:
        return sys.modules[dotted]
    spec = importlib.util.spec_from_file_location(
        dotted, f"{REFERENCE_ROOT}/{relpath}",
        submodule_search_locations=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = dotted.rsplit(".", 1)[0]
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_dataset_image_video():
    """`FlexAM/data/dataset_image_video.py` (for `process_pose_params` /
    `Camera` / `ray_condition` oracles). Its heavy loader deps
    (albumentations, decord, func_timeout, torchvision) are absent here;
    only their module-scope import names are stubbed — the pose-param
    code paths never touch them."""
    added = []
    for name in ("albumentations", "func_timeout", "decord",
                 "torchvision", "torchvision.transforms"):
        if name not in sys.modules:
            sys.modules[name] = _stub_module(name)
            added.append(name)
    sys.modules["decord"].VideoReader = object
    sys.modules["func_timeout"].FunctionTimedOut = type(
        "FunctionTimedOut", (Exception,), {})
    sys.modules["func_timeout"].func_timeout = lambda t, f, args=(), \
        kwargs=None: f(*args, **(kwargs or {}))
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]

    class _AnyAttr(types.ModuleType):
        def __getattr__(self, item):            # transforms.Compose etc.
            return lambda *a, **k: None

    sys.modules["torchvision.transforms"].__class__ = _AnyAttr
    try:
        return load_reference_module("FlexAM/data/dataset_image_video.py",
                                     "ref_dataset_image_video")
    finally:
        # leaving a fake torchvision in sys.modules makes transformers'
        # availability probe think it EXISTS, breaking every later
        # transformers-based oracle in the same process (same failure
        # class as the spec-less-stub note on _stub_module) — the loaded
        # module keeps its own references, so the global entries can go
        for name in added:
            sys.modules.pop(name, None)


def load_reference_module(relpath: str, name: str):
    """Load a reference python file as a standalone module (no package)."""
    _install_diffusers_stub()
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
