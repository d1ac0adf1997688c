from .attention import dot_product_attention, flash_attention, native_attention

__all__ = ["dot_product_attention", "flash_attention", "native_attention"]
