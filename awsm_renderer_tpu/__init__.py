"""awsm_renderer_tpu — TPU-native visibility-buffer renderer (JAX/Pallas).

Brand-new implementation of the capabilities of dakom/awsm-renderer
(Rust/WASM/WebGPU) redesigned for TPU: Pallas tile rasterizer, fused
deferred PBR shading, jitted effects/display chain, key-based scene API,
first-class glTF. See SURVEY.md at the repo root.
"""

from .config import AntiAliasing, PostProcessing, RendererConfig, ToneMapping
from .core.animation import (
    AnimationChannel, AnimationClip, AnimationPlayer, AnimationSampler,
    Interpolation, LoopStyle, TargetPath,
)
from .core.lights import Light, LightKind
from .core.materials import AlphaMode, PbrMaterial, TextureRef, UnlitMaterial
from .core.meshes import MeshGeometry
from .core.textures import MipmapKind, Sampler
from .core.transforms import Transform
from .renderer import AwsmRendererTpu

__all__ = [
    "AwsmRendererTpu", "RendererConfig", "AntiAliasing", "PostProcessing",
    "ToneMapping", "Transform", "MeshGeometry", "PbrMaterial", "UnlitMaterial",
    "AlphaMode", "TextureRef", "Light", "LightKind", "Sampler", "MipmapKind",
    "AnimationPlayer", "AnimationClip", "AnimationChannel", "AnimationSampler",
    "Interpolation", "LoopStyle", "TargetPath",
]

__version__ = "0.1.0"
