"""Registry entries under the reference's registered names.

The reference registers its modules via ``@threestudio.register(name)`` and
configs select them by string (SURVEY.md §1 plugin loading). Importing this
module populates the same names so ``find("gaussian-splatting-4d")`` etc.
resolve (the system itself is registered in systems/animate3d.py):

  * gaussian-splatting-animate3d-system  (systems/animate3d.py:43)
  * gaussian-splatting-4d                (geometry/gaussian_4d.py:67)
  * gaussian-splatting-3d-vis            (geometry/gaussian_3d_vis.py:40)
  * diff-gaussian-rasterizer-advanced-4d (renderer/...advanced_4d.py:23)
  * diff-gaussian-rasterizer-advanced    (static renderer, threestudio-3dgs)
  * animatemv-diffusion-guidance         (guidance/animatemv_guidance.py:54)
  * hybrid-random-camera-datamodule      (data/uncond_hybrid.py:702)
  * simple-multi-image-datamodule        (data/simple_multi_image.py:318)
  * stable-diffusion-prompt-processor    (prompt processor)
"""

from animate3d_tpu.core.registry import register

# import for the side effect of registering the system
import animate3d_tpu.systems.animate3d  # noqa: F401

from animate3d_tpu.gaussians.deform import DeformationField
from animate3d_tpu.gaussians.state import GaussianState
from animate3d_tpu.rendering import renderer4d
from animate3d_tpu.pipelines.guidance import AnimateMVGuidance
from animate3d_tpu.data.cameras import HybridRandomCameraSampler
from animate3d_tpu.data.multi_image import MultiImageDataset
from animate3d_tpu.models.prompt_processor import PromptProcessor

register("gaussian-splatting-4d")(DeformationField)
register("gaussian-splatting-3d-vis")(GaussianState)
register("diff-gaussian-rasterizer-advanced-4d")(renderer4d.Renderer4DConfig)
register("diff-gaussian-rasterizer-advanced")(renderer4d.Renderer4DConfig)
register("animatemv-diffusion-guidance")(AnimateMVGuidance)
register("hybrid-random-camera-datamodule")(HybridRandomCameraSampler)
register("simple-multi-image-datamodule")(MultiImageDataset)
register("stable-diffusion-prompt-processor")(PromptProcessor)
