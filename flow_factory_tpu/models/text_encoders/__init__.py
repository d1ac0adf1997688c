from .clip import CLIPTextConfig, CLIPTextEncoder, CLIPTextOutput
from .t5 import T5Config, T5Encoder
