"""Foundation tower model zoo (TPU-native re-design of the vendored
TencentPretrain layer, SURVEY §2.3): embeddings, encoders, targets,
decoder, composite model + reference-JSON config loader, and the torch
checkpoint importer. Used offline to precompute clean_feat.h5 features
(XLM-R text, ViT-B/16 images) and for pretraining."""

from lr2ppo_tpu.towers.model import TowerConfig, TowerModel, build_model
from lr2ppo_tpu.towers.torch_import import (
    load_tower_checkpoint,
    torch_tower_to_flax,
)

__all__ = [
    "TowerConfig", "TowerModel", "build_model",
    "load_tower_checkpoint", "torch_tower_to_flax",
]
