from .adapter import ZImageAdapter

__all__ = ["ZImageAdapter"]
