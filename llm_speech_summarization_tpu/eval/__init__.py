from .rouge import rouge_l, rouge_n, rouge_scores

__all__ = ["rouge_l", "rouge_n", "rouge_scores"]
