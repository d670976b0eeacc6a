from .generate import GenerateFn, greedy_generate, make_generate_fn
from .engine import LLMSpeechTextInference
from .paged import (
    PageAllocator,
    PagedKVCache,
    free_row,
    grow_pages,
    init_paged_cache,
    pages_needed,
    write_decode_token,
    write_prefill_pages,
)

__all__ = [
    "GenerateFn",
    "greedy_generate",
    "make_generate_fn",
    "LLMSpeechTextInference",
    "PageAllocator",
    "PagedKVCache",
    "free_row",
    "grow_pages",
    "init_paged_cache",
    "pages_needed",
    "write_decode_token",
    "write_prefill_pages",
]
