from . import pytree_io

__all__ = ["pytree_io"]
