"""mae_clip_tpu: TPU-native CLIP+MAE training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ykojima4020/mae_clip (dual-tower contrastive training, retrieval and
zero-shot inference, checkpointing, config, logging) plus the MAE objective
the reference names but never shipped, designed for TPU meshes.
"""

__version__ = "0.1.0"

from mae_clip_tpu.config import (Config, MAEConfig, MeshConfig,
                                 coco_full_config, flagship_siglip_config,
                                 flagship_tpu_config,
                                 large_batch_mesh_config,
                                 mae_pretrain_config, notebook_config,
                                 reference_py_config)

__all__ = [
    "Config", "MAEConfig", "MeshConfig",
    "reference_py_config", "notebook_config", "flagship_tpu_config",
    "flagship_siglip_config",
    "coco_full_config", "large_batch_mesh_config", "mae_pretrain_config",
]
