from .norms import layer_norm, rms_norm
from .rope import apply_rope, rope_inv_freq
from .attention import dot_product_attention, make_attention_bias
from .pooling import avg_pool_time, ctc_segment_mean, stack_downsample
from .ring_attention import ring_attention
from .splice import SplicedBatch, splice_sequences
from .losses import (
    feature_distillation_loss,
    fused_ntp_ld_losses,
    response_cross_entropy,
    soft_cross_entropy,
)

__all__ = [
    "layer_norm",
    "rms_norm",
    "apply_rope",
    "rope_inv_freq",
    "dot_product_attention",
    "make_attention_bias",
    "avg_pool_time",
    "ctc_segment_mean",
    "stack_downsample",
    "ring_attention",
    "SplicedBatch",
    "splice_sequences",
    "feature_distillation_loss",
    "fused_ntp_ld_losses",
    "response_cross_entropy",
    "soft_cross_entropy",
]
