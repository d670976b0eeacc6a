from .decode_attention import decode_attention
from .flash_attention import flash_attention
from .paged_attention import paged_decode_attention

__all__ = ["decode_attention", "flash_attention", "paged_decode_attention"]
