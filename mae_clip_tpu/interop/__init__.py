from mae_clip_tpu.interop.torch_import import (import_clip_state_dict,
                                               import_distilbert,
                                               import_projection_head,
                                               import_resnet50,
                                               import_timm_vit,
                                               load_pth_state_dict)

__all__ = [
    "import_clip_state_dict", "import_distilbert", "import_projection_head",
    "import_resnet50", "import_timm_vit", "load_pth_state_dict",
]
