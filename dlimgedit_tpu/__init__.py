"""dlimgedit_tpu — a TPU-native deep-learning image-editing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of dlimgedit
(/root/reference): interactive segmentation (SAM family: MobileSAM vit_t,
and SAM ViT-B/L/H) and dichotomous foreground segmentation (BiRefNet), with
the same public vocabulary — Environment, Segmentation.process /
compute_mask(s), segment_objects, Image / ImageView — so the reference's
C++14 header can sit on a thin C shim over this runtime (native/).

Quick start::

    import dlimgedit_tpu as dl

    env = dl.Environment(dl.Options(backend=dl.Backend.tpu,
                                    model_directory="models"))
    img = dl.Image.load("photo.png")
    seg = dl.Segmentation.process(img, env)      # embed once (on device)
    mask = seg.compute_mask(dl.Point(320, 210))  # cheap interactive queries
    mask = seg.compute_mask(dl.Region(dl.Point(10, 10), dl.Point(200, 150)))
    masks = seg.compute_masks(dl.Point(320, 210))  # 3 candidates + accuracy
    fg = dl.segment_objects(img, env)            # BiRefNet foreground mask
"""

from .errors import DlimgError, ModelNotFoundError, UnsupportedImageError
from .runtime.amg import generate_masks_image
from .runtime.environment import Environment, is_supported
from .runtime.segmentation import Mask, Segmentation, segment_objects
from .types import (
    Backend,
    Channels,
    Extent,
    Image,
    ImageView,
    Options,
    Point,
    Region,
    channel_count,
)

__version__ = "0.1.0"

__all__ = [
    "Backend", "Channels", "DlimgError", "Environment", "Extent", "Image",
    "ImageView", "Mask", "ModelNotFoundError", "Options", "Point", "Region",
    "Segmentation", "UnsupportedImageError", "channel_count",
    "generate_masks_image", "is_supported", "segment_objects",
    "__version__",
]
