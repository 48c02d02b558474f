from mae_clip_tpu.models.clip import CLIPModel, vit_config_for
from mae_clip_tpu.models.distilbert import (DistilBertConfig, DistilBertModel,
                                            TextEncoder)
from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEOutput, MAEViT
from mae_clip_tpu.models.projection import ProjectionHead
from mae_clip_tpu.models.resnet import ResNet, resnet50
from mae_clip_tpu.models.vit import (VIT_B16, VIT_S16, PatchEmbed, ViTConfig,
                                     ViTEncoder, patchify, unpatchify)

__all__ = [
    "CLIPModel", "vit_config_for", "DistilBertConfig", "DistilBertModel",
    "TextEncoder", "MAEDecoderConfig", "MAEOutput", "MAEViT",
    "ProjectionHead", "ResNet", "resnet50", "VIT_B16", "VIT_S16",
    "PatchEmbed", "ViTConfig", "ViTEncoder", "patchify", "unpatchify",
]
