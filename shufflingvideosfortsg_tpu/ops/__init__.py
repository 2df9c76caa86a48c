from .span import span_decode, span_decode_matrix, compute_mean_iou  # noqa: F401
from .losses import (  # noqa: F401
    span_ground_loss, bce_loss, masked_softmax, mask_logits,
    matching_kl_divergence, temporal_order_discrimination_loss)
