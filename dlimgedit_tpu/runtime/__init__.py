from .environment import Environment, is_supported
from .segmentation import Segmentation, segment_objects

__all__ = ["Environment", "is_supported", "Segmentation", "segment_objects"]
