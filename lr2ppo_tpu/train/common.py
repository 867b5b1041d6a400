"""Shared trainer plumbing: train state, device placement, save-best."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lr2ppo_tpu.parallel import make_mesh, put_batch, shard_params
from lr2ppo_tpu.train import checkpoints


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params["params"]),
                      jnp.zeros([], jnp.int32))


def apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads["params"], state.opt_state,
                                 state.params["params"])
    new_params = {"params": optax.apply_updates(state.params["params"],
                                                updates)}
    return TrainState(new_params, new_opt, state.step + 1)


class DeviceCtx:
    """Mesh + placement helpers; mesh=None means default single device."""

    def __init__(self, dp: int = -1, tp: int = 1, enabled: bool = True):
        self.mesh = make_mesh(dp, tp) if enabled else None

    def put(self, batch):
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        return put_batch(batch, self.mesh)

    def place_params(self, tree):
        if self.mesh is None:
            return tree
        return shard_params(tree, self.mesh)


class BestSaver:
    """Save-best contract (model_saver.py:4-11, ppo.py:910-915)."""

    def __init__(self, path: str, logger=None):
        self.path = path
        self.best = -np.inf
        self.logger = logger

    def maybe_save(self, metric: float, tree, metadata: Optional[dict] = None
                   ) -> bool:
        if metric <= self.best:
            return False
        self.best = float(metric)
        if self.path:
            checkpoints.save_checkpoint(
                self.path, tree, {**(metadata or {}), "metric": self.best})
        if self.logger:
            self.logger.info("Best val indicator until now!")
        return True
