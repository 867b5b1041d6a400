"""Pod checkpointing through the orbax backend (--ckpt_backend orbax).

The pickle backend's pod contract is replicate-gather + rank-0 single
file; orbax is the TPU-idiomatic alternative — a sharded-array-aware
checkpoint directory where EVERY process participates in the save (the
primary writes metadata, each host contributes its shards) and restore
is backend-transparent. This test runs the real PointwiseTrainer as a
2-process pod with ckpt_backend='orbax' into one SHARED directory,
resumes from the orbax .state mid-run, and asserts both ranks end
bit-identical and match a 1-process oracle doing the same save/resume
over the same global batches (reference save path: model_saver.py:4-11
gated by misc.py:77-91 is_master; orbax replaces the gather)."""

import pytest

from test_multihost import _POD_PRELUDE, _check_pod_matches_oracle

pytest.importorskip("orbax.checkpoint")

# Consumes the shared prelude (coordinator/pid/world/out in argv[1:5]);
# the checkpoint directory is shared across ranks and derived from the
# per-rank `out` path's directory + world so pod and oracle legs don't
# collide.
_ORBAX_CHILD = _POD_PRELUDE + r"""
import os

from lr2ppo_tpu.train.pointwise import PointwiseTrainer

ck = os.path.join(os.path.dirname(out), f"ck_w{world}")
cfg.epochs_num = 1
cfg.ckpt_backend = "orbax"
cfg.output_model_path = os.path.join(ck, "best.ckpt")
cfg.save_state_steps = 2


def fresh_loaders():
    return (Loader(DS(), BS, shuffle=True, seed=5, num_workers=1,
                   shard=shard),
            EvalLoader(DS(), buckets=[TAGS], batch_size=BS))


loader, ev = fresh_loaders()
state, best = PointwiseTrainer(cfg).fit(loader, ev)
# orbax artifacts are DIRECTORIES on the shared storage, visible to
# every rank: save-best and the periodic full TrainState
assert os.path.isdir(cfg.output_model_path), cfg.output_model_path
assert os.path.isdir(cfg.output_model_path + ".state")

# resume from the orbax .state (backend-transparent load) and finish a
# second epoch as the same pod
cfg = cfg.replace(resume_path=cfg.output_model_path + ".state",
                  epochs_num=2)
loader, ev = fresh_loaders()
state, best = PointwiseTrainer(cfg).fit(loader, ev)
assert int(state.step) == 2 * (N // BS), int(state.step)
dump(state.params, best)
"""


@pytest.mark.heavy
def test_two_process_orbax_save_resume(tmp_path):
    _check_pod_matches_oracle(_ORBAX_CHILD, tmp_path, "orbax")
