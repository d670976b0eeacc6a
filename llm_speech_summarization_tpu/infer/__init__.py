from .generate import GenerateFn, greedy_generate, make_generate_fn
from .engine import LLMSpeechTextInference

__all__ = ["GenerateFn", "greedy_generate", "make_generate_fn", "LLMSpeechTextInference"]
