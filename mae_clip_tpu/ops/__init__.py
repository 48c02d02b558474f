from mae_clip_tpu.ops.attention import (attention_xla, flash_attention,
                                        multi_head_attention)
from mae_clip_tpu.ops.losses import (clip_soft_ce_loss, cross_entropy_soft,
                                     global_clip_soft_ce_loss,
                                     global_clip_soft_ce_loss_chunked,
                                     global_siglip_loss,
                                     clip_hard_ce_loss,
                                     global_clip_hard_ce_loss,
                                     mae_reconstruction_loss, siglip_loss)
from mae_clip_tpu.ops.masking import (MaskingResult, gather_patches,
                                      random_masking,
                                      scatter_with_mask_tokens)

__all__ = [
    "attention_xla", "flash_attention", "multi_head_attention",
    "clip_soft_ce_loss", "cross_entropy_soft", "global_clip_soft_ce_loss",
    "global_clip_soft_ce_loss_chunked", "global_siglip_loss", "siglip_loss",
    "clip_hard_ce_loss", "global_clip_hard_ce_loss",
    "mae_reconstruction_loss", "MaskingResult", "gather_patches",
    "random_masking", "scatter_with_mask_tokens",
]
