from .prompts import (
    LLAMA_PROMPT_PREFIX,
    LLAMA_PROMPT_SUFFIX,
    MINICHAT_PROMPT_PREFIX,
    MINICHAT_PROMPT_SUFFIX,
    SYSTEM_PROMPT,
    compute_num_audio_embeds,
    prompt_template_for,
)
from .tokenizer import ByteTokenizer, Tokenizer, load_tokenizer

__all__ = [
    "LLAMA_PROMPT_PREFIX",
    "LLAMA_PROMPT_SUFFIX",
    "MINICHAT_PROMPT_PREFIX",
    "MINICHAT_PROMPT_SUFFIX",
    "SYSTEM_PROMPT",
    "compute_num_audio_embeds",
    "prompt_template_for",
    "ByteTokenizer",
    "Tokenizer",
    "load_tokenizer",
]
