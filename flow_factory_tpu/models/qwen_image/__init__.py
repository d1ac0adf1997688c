from .adapter import QwenImageAdapter

__all__ = ["QwenImageAdapter"]
