"""pgica_tpu.ops subpackage."""
from pgica_tpu.ops.attention import dot_product_attention
from pgica_tpu.ops.losses import (
    ntxent_loss,
    dpo_loss,
    sequence_logprobs,
    caption_cross_entropy,
    l2_normalize,
)
