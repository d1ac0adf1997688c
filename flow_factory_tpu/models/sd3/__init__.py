from .transformer import MMDiTConfig, SD3Transformer
