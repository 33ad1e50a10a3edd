from .io import load_image, save_image
from .resize import resize, resize_mask, resize_longest_side_extent

__all__ = ["load_image", "save_image", "resize", "resize_mask",
           "resize_longest_side_extent"]
