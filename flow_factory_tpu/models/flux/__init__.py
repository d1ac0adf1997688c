from .adapter import Flux1Adapter
from .kontext import Flux1KontextAdapter
from .transformer import FluxConfig, FluxTransformer

__all__ = ["Flux1Adapter", "Flux1KontextAdapter", "FluxConfig", "FluxTransformer"]
