"""awsm_renderer_tpu — TPU-native visibility-buffer renderer (JAX/Pallas).

Brand-new implementation of the capabilities of dakom/awsm-renderer
(Rust/WASM/WebGPU) redesigned for TPU: Pallas tile rasterizer, fused
deferred PBR shading, jitted effects/display chain, key-based scene API,
first-class glTF. See SURVEY.md at the repo root.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: pipeline-variant compiles are the expensive
# "shader compile" events (SURVEY §3.5); cache them across processes like
# the reference caches compiled shader modules. CPU is excluded: its AOT
# artifacts embed machine-feature flags that don't reload reliably.
if _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("AWSM_JAX_CACHE", _os.path.expanduser("~/.cache/awsm_jax")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass

from .config import AntiAliasing, PostProcessing, RendererConfig, ToneMapping
from .core.animation import (
    AnimationChannel, AnimationClip, AnimationPlayer, AnimationSampler,
    Interpolation, LoopStyle, TargetPath,
)
from .core.lights import Light, LightKind
from .core.materials import (
    AlphaMode, PbrDebug, PbrMaterial, TextureRef, UnlitMaterial,
)
from .core.meshes import MeshGeometry
from .core.textures import MipmapKind, Sampler
from .core.transforms import Transform
from .renderer import AwsmRendererTpu

__all__ = [
    "AwsmRendererTpu", "RendererConfig", "AntiAliasing", "PostProcessing",
    "ToneMapping", "Transform", "MeshGeometry", "PbrMaterial", "UnlitMaterial",
    "AlphaMode", "PbrDebug", "TextureRef", "Light", "LightKind", "Sampler", "MipmapKind",
    "AnimationPlayer", "AnimationClip", "AnimationChannel", "AnimationSampler",
    "Interpolation", "LoopStyle", "TargetPath",
]

from . import errors  # typed per-subsystem error hierarchy (error.rs analog)
from .errors import AwsmError

__all__ += ["errors", "AwsmError"]

__version__ = "0.1.0"
