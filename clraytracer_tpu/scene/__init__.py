"""Scene & asset layer.

TPU-native replacement of the reference's resource/asset stack
(ResourceManager.{cpp,hpp}, AssetManager.{cpp,hpp}, BVH.cpp): SoA scene
pytrees, a vectorized OBJ/MTL importer, a packed RGB texel-pool atlas, a
versioned compressed ``.npz`` cache (replacing the quicklz ``.clm`` cache),
and a SceneBuilder with the same pool/push design.
"""

from clraytracer_tpu.scene.types import (  # noqa: F401
    BVH,
    Instances,
    Materials,
    Scene,
    TextureAtlas,
    Triangles,
)
from clraytracer_tpu.scene.builder import SceneBuilder  # noqa: F401
