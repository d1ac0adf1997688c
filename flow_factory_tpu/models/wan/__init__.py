from .t2v import WanT2VAdapter
from .transformer import WanConfig, WanTransformer
from .video_vae import VideoVAE, VideoVAEConfig

__all__ = ["WanT2VAdapter", "WanConfig", "WanTransformer", "VideoVAE", "VideoVAEConfig"]
