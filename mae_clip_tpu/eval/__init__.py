from mae_clip_tpu.eval.retrieval import (compute_image_embeddings,
                                         find_matches, recall_at_k)
from mae_clip_tpu.eval.zeroshot import (build_zero_shot_classifier,
                                        zero_shot_accuracy, zero_shot_probs)

__all__ = [
    "compute_image_embeddings", "find_matches", "recall_at_k",
    "build_zero_shot_classifier", "zero_shot_accuracy", "zero_shot_probs",
]
