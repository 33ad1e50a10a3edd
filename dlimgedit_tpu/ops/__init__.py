from . import preprocess, postprocess, resample, connected

__all__ = ["preprocess", "postprocess", "resample", "connected"]
