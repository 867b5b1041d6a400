"""Multi-host bring-up and pod-style data feeding.

1. `initialize_distributed` (parallel/mesh.py, the torchrun env://
   replacement) exercised for real with two local CPU processes
   rendezvousing through a coordinator and running a cross-process
   collective.
2. The full process-local input path (VERDICT round-2 #1): two processes
   each feed ONLY their `Loader(shard=(rank, world))` slice of every
   global batch through `DeviceCtx.put` (which assembles global arrays
   via `jax.make_array_from_process_local_data`) into the real
   `PointwiseTrainer.fit` loop — the TPU analogue of the reference's
   per-rank reader sharding (tencentpretrain/utils/dataloader.py:32-39,
   DistributedSampler in finetune/ppo.py:684-699). Both ranks must end
   with IDENTICAL params, and those params must match a single-process
   run over the same global batches.
"""

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
from lr2ppo_tpu.parallel.mesh import initialize_distributed

initialize_distributed(coordinator=coordinator, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()          # global view
assert len(jax.local_devices()) == 1

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("dp",))
sh = NamedSharding(mesh, P("dp"))
# each process contributes its rank+1; the jitted global sum must see
# both shards -> 1 + 2 = 3 everywhere
x = jax.make_array_from_callback(
    (2,), sh, lambda idx: np.asarray([jax.process_index() + 1.0],
                                     np.float32))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 3.0, float(total)
print(f"proc {pid} OK total={float(total)}")
"""

# Shared scaffolding for the training children: coordinator rendezvous,
# identical synthetic data on every rank, tiny multimodal config, and
# the (rank, world) shard. Eval loaders are deliberately UNSHARDED:
# every rank assembles the identical full batch; DeviceCtx.put_eval
# slices each rank's rows out of that full copy and the evaluators
# fetch dp-sharded rows through fetch_global's replicate-then-read —
# the pod eval path end-to-end.
_POD_PRELUDE = r"""
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, pid, world, out = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
if world > 1:
    from lr2ppo_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=coordinator, num_processes=world,
                           process_id=pid)
    assert jax.process_count() == world

import numpy as np

from lr2ppo_tpu.config import Config, ModelConfig
from lr2ppo_tpu.data import EvalLoader
from lr2ppo_tpu.data.pipeline import Loader

FEAT, SEQ, IMGS, TAGS, BS, N = 8, 3, 2, 2, 4, 16
rng = np.random.RandomState(3)           # identical data on every rank
items = [dict(text=rng.randn(TAGS, SEQ, FEAT).astype(np.float32),
              img=rng.randn(IMGS, FEAT).astype(np.float32),
              tgts=rng.randint(0, 3, (TAGS,)).astype(np.float32),
              # 4-index chosen/reject patterns (reward pairs); unused
              # extra keys for the other trainers
              chosen_index=np.asarray([0, 1, 0, 1], np.int32),
              reject_index=np.asarray([0, 1, 1, 0], np.int32))
         for _ in range(N)]


class DS:
    def __len__(self):
        return N

    def get(self, i):
        return items[i]


mcfg = ModelConfig(family="multimodal", feat_size=FEAT, seq_length=SEQ,
                   max_imgs=IMGS, num_heads=2, mode="reg",
                   drop_p=0.0, forward_drop_p=0.0)
cfg = Config(model=mcfg)
cfg.batch_size = BS
cfg.report_steps = 10 ** 6
cfg.output_model_path = ""

shard = (jax.process_index(), world) if world > 1 else None


def dump(params, best):
    assert np.isfinite(best) and 0.0 < best <= 1.0, best
    host = jax.tree.map(np.asarray, jax.device_get(params))
    with open(out, "wb") as f:
        pickle.dump({"params": host, "best": float(best)}, f)
    print(f"proc {pid}/{world} trained OK")
"""

# Trains the real PointwiseTrainer over a dp mesh spanning every process,
# feeding process-local Loader shards; world=1 is the single-process
# oracle over the identical global batches.
_TRAIN_CHILD = _POD_PRELUDE + r"""
from lr2ppo_tpu.train.pointwise import PointwiseTrainer

cfg.epochs_num = 2
loader = Loader(DS(), BS, shuffle=True, seed=5, num_workers=1, shard=shard)
ev = EvalLoader(DS(), buckets=[TAGS], batch_size=BS)
state, best = PointwiseTrainer(cfg).fit(loader, ev)
dump(state.params, best)
"""

# Tower pretraining over the pod mesh WITH gradient accumulation:
# each rank feeds chunk-interleaved shards (shard_chunks=accum, the
# layout the in-compile lax.scan accumulation folds), the path the
# pretrain CLI wires for pods. No eval metric — dump best=0.5 sentinel.
_PRETRAIN_CHILD = _POD_PRELUDE + r"""
from lr2ppo_tpu.towers.model import TowerConfig
from lr2ppo_tpu.train.pretrain import PretrainTrainer


class TowerDS:
    def set_epoch(self, e):
        pass

    def __len__(self):
        return N

    def get(self, i):
        r = np.random.default_rng(i)          # identical on every rank
        src = r.integers(5, 30, 8).astype(np.int32)
        tgt = np.where(r.random(8) < 0.3, src, 0).astype(np.int32)
        return {"src": src, "tgt": tgt, "seg": np.ones(8, np.int32)}


ACCUM = 2
cfg.epochs_num = 2
tcfg = TowerConfig(emb_size=16, hidden_size=16, feedforward_size=32,
                   heads_num=4, layers_num=1, max_seq_length=16,
                   vocab_size=32)
loader = Loader(TowerDS(), BS, shuffle=True, seed=5, num_workers=1,
                shard=shard, shard_chunks=ACCUM)
tr = PretrainTrainer(cfg, tcfg, accumulation_steps=ACCUM)
state, _ = tr.fit(loader)
dump(state.params, 0.5)
"""

# Stage-2 reward trainer: dual-forward hinge over the pod mesh, plus
# the pairwise-accuracy eval path (fetch_global on dp-sharded hits).
_REWARD_CHILD = _POD_PRELUDE + r"""
from lr2ppo_tpu.train.reward import RewardTrainer

cfg.epochs_num = 2
loader = Loader(DS(), BS, shuffle=True, seed=5, num_workers=1, shard=shard)
ev = Loader(DS(), BS, shuffle=False, num_workers=1)
state, best = RewardTrainer(cfg).fit(loader, ev)
dump(state.params, best)
"""

# The flagship pod path: PPOTrainer over a 2-process dp mesh. Exercises
# the pod-only branches end-to-end — put_array's global per-timestep
# state, forced device-resident memories (host np.asarray of
# non-addressable shards is impossible), rank-0-gated checkpoint/metric
# writes, and the pod eval path. world=1 is the oracle.
_PPO_CHILD = _POD_PRELUDE + r"""
from lr2ppo_tpu.train.ppo import PPOTrainer

cfg.epochs_num = 1
cfg.ppo.update_timesteps = 2
cfg.data.max_tags = TAGS


def make_train_loader(epoch):
    return Loader(DS(), BS, shuffle=True, seed=epoch, num_workers=1,
                  shard=shard)


ev = EvalLoader(DS(), buckets=[TAGS], batch_size=BS)
astate, cstate, best = PPOTrainer(cfg).fit(make_train_loader, ev)
dump(astate.params, best)
"""


def _free_port() -> int:
    # bind-then-close port probing is a TOCTOU race on a shared host:
    # callers retry the whole rendezvous with a fresh port on failure
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(script, argv_per_proc, env, timeout=240):
    """Launch one python per argv; `script` is inlined via -c, or pass
    script=None with full argv tails (e.g. ['-m', 'lr2ppo_tpu.cli...'])."""
    prefix = [] if script is None else ["-c", script]
    procs = [
        subprocess.Popen([sys.executable, *prefix, *argv],
                         env=env, cwd=_REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for argv in argv_per_proc
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def _cpu_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # one real device per process
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_distributed_initialize():
    env = _cpu_env()
    for attempt in range(3):
        coordinator = f"127.0.0.1:{_free_port()}"
        procs, outs = _spawn(_CHILD, [[coordinator, str(i)]
                                      for i in range(2)], env)
        if all(p.returncode == 0 for p in procs):
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "OK total=3.0" in out


from fixtures import flatten_tree as _flatten  # noqa: E402


def _check_pod_matches_oracle(child, tmp_path, stem):
    """Run `child` as a 2-process pod (each rank feeding its Loader
    shard) and as a 1-process oracle over the same global batches, then
    assert the pod ranks end bit-identical and match the oracle."""
    env = _cpu_env()
    paths = [str(tmp_path / f"{stem}_{i}.pkl") for i in range(2)]
    for attempt in range(3):
        coordinator = f"127.0.0.1:{_free_port()}"
        procs, outs = _spawn(
            child,
            [[coordinator, str(i), "2", paths[i]] for i in range(2)],
            env, timeout=420)
        if all(p.returncode == 0 for p in procs):
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"

    base = str(tmp_path / f"{stem}_base.pkl")
    procs, outs = _spawn(child, [["-", "0", "1", base]], env,
                         timeout=420)
    assert procs[0].returncode == 0, outs[0][-3000:]

    trees = []
    for path in paths + [base]:
        with open(path, "rb") as f:
            trees.append(pickle.load(f))
    r0, r1, oracle = trees
    # the eval metric is global and replicated: identical on both ranks
    # and equal to the single-process run's
    assert r0["best"] == r1["best"]
    np.testing.assert_allclose(r0["best"], oracle["best"], rtol=1e-4)
    flat0, flat1 = _flatten(r0["params"]), _flatten(r1["params"])
    flatb = _flatten(oracle["params"])
    assert flat0.keys() == flat1.keys() == flatb.keys()
    for k in flat0:
        # SPMD is deterministic: both ranks hold the identical replicated
        # result, bit for bit
        np.testing.assert_array_equal(flat0[k], flat1[k], err_msg=k)
        # and it matches the 1-process run up to reduction-order noise
        np.testing.assert_allclose(flat0[k], flatb[k], rtol=2e-4,
                                   atol=2e-5, err_msg=k)


@pytest.mark.heavy
def test_two_process_pointwise_training(tmp_path):
    _check_pod_matches_oracle(_TRAIN_CHILD, tmp_path, "params")


@pytest.mark.heavy
def test_two_process_reward_training(tmp_path):
    _check_pod_matches_oracle(_REWARD_CHILD, tmp_path, "reward")


@pytest.mark.heavy
def test_two_process_pretrain_accum_training(tmp_path):
    _check_pod_matches_oracle(_PRETRAIN_CHILD, tmp_path, "pretrain")


@pytest.mark.heavy
def test_two_process_ppo_training(tmp_path):
    _check_pod_matches_oracle(_PPO_CHILD, tmp_path, "ppo")


@pytest.mark.heavy
def test_cli_distributed_launch(tmp_path):
    """The torchrun replacement end-to-end: the SAME CLI command runs
    once per 'host' with --distributed/--coordinator/--num_processes/
    --process_id and trains as one pod (cli/_common.py:
    maybe_init_distributed). Uses the tabular pointwise stage (smallest
    model)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_letor_groups
    from lr2ppo_tpu.data.letor import save_grouped_h5

    groups = make_letor_groups(n_queries=8, docs=6, n_feat=16, seed=2)
    h5 = str(tmp_path / "train.h5")
    save_grouped_h5(groups, h5)
    env = _cpu_env()
    outs_paths = [str(tmp_path / f"cli_{i}.ckpt") for i in range(2)]

    def argv(i, port):
        return ["-m", "lr2ppo_tpu.cli.pointwise_trad",
                "--jax_platform", "cpu",     # sitecustomize pins axon
                "--distributed", "true",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(i),
                "--train_path", h5, "--dev_path", h5,
                "--feat_size", "16", "--visual_feat_dim", "16",
                "--epochs_num", "1", "--batch_size", "4",
                "--report_steps", "1000000",
                "--output_model_path", outs_paths[i]]

    for attempt in range(3):
        port = _free_port()
        try:
            procs, outs = _spawn(None, [argv(i, port) for i in range(2)],
                                 env, timeout=420)
        except subprocess.TimeoutExpired:
            continue                      # hung rendezvous: fresh port
        if all(p.returncode == 0 for p in procs):
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
    # rank-0-gated saves: only process 0 wrote its best checkpoint
    assert os.path.exists(outs_paths[0])
    assert not os.path.exists(outs_paths[1])
