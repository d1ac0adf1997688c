from .attention import dot_product_attention, flash_attention, native_attention
from .ring_attention import make_ring_attention, ring_flash_attention

__all__ = [
    "dot_product_attention",
    "flash_attention",
    "native_attention",
    "ring_flash_attention",
    "make_ring_attention",
]
