"""LR2PPO-TPU: a TPU-native (JAX/XLA/Pallas/pjit) label-relevance-ranking
framework with the capabilities of the LR2PPO reference (ECCV 2024,
"Multimodal Label Relevance Ranking via Reinforcement Learning").

The framework implements the three-stage LR2PPO recipe:

  stage 1 — pointwise cross-modal scorer  (reference: finetune/pointwise.py)
  stage 2 — pairwise reward model         (reference: finetune/reward_pair_dataloader.py)
  stage 3 — LR2PPO actor-critic PPO       (reference: finetune/ppo.py)

in two task families:

  * LRMovieNet multimodal (precomputed XLM-R text + ViT image embeddings)
  * LETOR tabular transfer (MSLR-Web10K -> MQ2008, *_trad scripts)

Everything on the compute path is pure JAX: models are flax.linen modules,
train/rollout/update steps are jit-compiled over a `jax.sharding.Mesh`
(data parallel + tensor parallel for the wide fusion MLP), and collectives
ride ICI via pjit-inserted psum/all_gather instead of NCCL.
"""

__version__ = "0.1.0"

from lr2ppo_tpu import config as config  # noqa: F401
