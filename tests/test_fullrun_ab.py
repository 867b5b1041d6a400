"""Full-run convergence A/B against the reference (VERDICT r4 #1) —
the last correctness rung above the 10-step trajectory oracles.

Both sides run the COMPLETE three-stage tabular recipe, end to end, on
identical planted-structure LETOR transfer data (fixtures.
make_planted_letor_dirs: source scorer w1 with label noise, target
scorer w2 = rotated w1, clean target labels — the Web10K -> MQ2008
shape of datasets_trad/README.md):

  reference: finetune/pointwise_trad.py -> reward_trad.py ->
             ppo_trad.py, their UNMODIFIED main() driven to completion
             on CPU via tests/ref_fullrun_driver.py (gloo world=1,
             .cuda() identity — placement shims only, zero math
             changes). Anchors: pointwise_trad.py:483-539 (save-best
             loop), reward_trad.py train loop, ppo_trad.py:745-849
             (rollout + sweep + eval + save-best).
  ours:      cli.pointwise_trad -> cli.reward_trad -> cli.ppo_trad on
             the very same h5 files, same hyperparameters.

The two sides share NO rng streams (independent inits, independent
sampling) — this is an end-METRIC comparison: given the same data and
recipe, both frameworks must land at the same place. Assertions cover
the per-stage end metrics (within tolerances set by the planted task's
seed-to-seed spread) and the stage-3-vs-stage-1 behavior.

Epoch-count note: the reference's PPO loop is `range(1, epochs_num)`
(ppo_trad.py:745) = N-1 epochs; ours runs the faithful N. The test
passes REF_PPO_EPOCHS = ours + 1 so both execute the same work.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_planted_letor_dirs

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "finetune"))
DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ref_fullrun_driver.py")

# shared recipe (both sides verbatim; lr raised from the reference
# defaults so ~100-step stages actually converge on the planted task)
S1 = dict(epochs=6, bs=4, lr=1e-4, report=6)
S2 = dict(epochs=4, bs=32, lr=1e-4, report=30)
S3 = dict(epochs=3, bs=24, lr=1e-3, update_timesteps=40)

TOKENIZER_ARGS = [
    "--vocab_path", "models/huggingface_gpt2_vocab.txt",
    "--merges_path", "models/huggingface_gpt2_merges.txt",
    "--tokenizer", "bpe",
    "--config_path", "models/xlm-roberta/base_config.json",
    "--encoder", "transformer",
    "--vit_tokenizer", "virtual",
    "--vit_config_path", "models/vit/base-16-224_config.json",
    "--vit_encoder", "transformer",
    "--mask", "fully_visible",
]


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_ref_stage(stage, flags, timeout=1500):
    env = dict(os.environ,
               RANK="0", WORLD_SIZE="1", LOCAL_RANK="0",
               MASTER_ADDR="127.0.0.1", MASTER_PORT=str(_free_port()))
    proc = subprocess.run(
        [sys.executable, DRIVER, stage, *flags, *TOKENIZER_ARGS],
        cwd=REF, env=env, capture_output=True, text=True,
        timeout=timeout)
    assert f"REF_STAGE_DONE {stage}" in proc.stdout, (
        f"reference {stage} leg failed:\n{proc.stderr[-3000:]}")


def _log_best(path, pattern):
    hits = re.findall(pattern, open(path).read())
    assert hits, f"no {pattern!r} in {path}"
    return max(float(h) for h in hits)


def _run_our_stage(cli_name, flags, timeout=2400):
    code = (
        "import sys, faulthandler\n"
        "faulthandler.enable()\n"
        "import os\n"
        "os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS','') +\n"
        "    ' --xla_force_host_platform_device_count=8')\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"from lr2ppo_tpu.cli import {cli_name}\n"
        f"best = {cli_name}.main(sys.argv[1:])\n"
        "print('OURS_BEST', float(best))\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", code, *flags], cwd=repo,
        capture_output=True, text=True, timeout=timeout)
    for line in proc.stdout.splitlines():
        if line.startswith("OURS_BEST "):
            return float(line.split()[1])
    raise AssertionError(
        f"our {cli_name} leg failed (rc={proc.returncode}):\n"
        f"{proc.stderr[-3000:]}")


@pytest.fixture(scope="module")
def ab(tmp_path_factory):
    if not HAS_REF:
        pytest.skip("reference repo not mounted")
    root = tmp_path_factory.mktemp("ab")
    src, merged = make_planted_letor_dirs(
        str(root / "data"), n_src=48, n_tgt=48, n_test=32, docs=20,
        n_feat=768, seed=5)
    out = root / "out"
    out.mkdir()
    r = {}

    # ---------------- reference legs (subprocess, cwd=/root/reference)
    _run_ref_stage("pointwise", [
        "--train_path", src, "--dev_path", merged, "--test_path", merged,
        "--epochs_num", str(S1["epochs"]), "--batch_size", str(S1["bs"]),
        "--learning_rate", str(S1["lr"]),
        "--report_steps", str(S1["report"]), "--mode", "reg",
        "--max_tags", "20", "--exp_name", "ab",
        "--output_model_path", str(out / "ref_s1.bin"),
        "--log_path", str(out / "ref_s1.txt")])
    r["ref_s1"] = _log_best(out / "ref_s1.txt", r"Best NDCG: ([0-9.]+)")

    _run_ref_stage("reward", [
        "--train_path", merged, "--dev_path", merged,
        "--test_path", merged,
        "--epochs_num", str(S2["epochs"]), "--batch_size", str(S2["bs"]),
        "--learning_rate", str(S2["lr"]),
        "--report_steps", str(S2["report"]), "--mode", "cls",
        "--max_tags", "20", "--exp_name", "ab",
        "--output_model_path", str(out / "ref_s2.bin"),
        "--log_path", str(out / "ref_s2.txt")])
    r["ref_s2"] = _log_best(out / "ref_s2.txt", r"Best Acc: ([0-9.]+)")

    _run_ref_stage("ppo", [
        "--train_path", merged, "--dev_path", merged,
        "--test_path", merged,
        # range(1, N): N-1 real epochs -> pass ours+1
        "--epochs_num", str(S3["epochs"] + 1),
        "--batch_size", str(S3["bs"]), "--mode", "reg",
        "--max_tags", "80", "--exp_name", "ab", "--report_steps", "100",
        "--pretrained_model_path", str(out / "ref_s1.bin"),
        "--reward_model_path", str(out / "ref_s2.bin"),
        "--max_timesteps", "1",
        "--update_timesteps", str(S3["update_timesteps"]),
        "--value_clip", "0.5", "--eps_clip", "0.2",
        "--kl_div_loss_weight", "0.001", "--entropy_weight", "0.001",
        "--learning_rate", str(S3["lr"]),
        "--critic_learning_rate", str(S3["lr"]),
        "--output_model_path", str(out / "ref_s3.bin"),
        "--log_path", str(out / "ref_s3.txt")], timeout=2400)
    r["ref_s3"] = _log_best(out / "ref_s3.txt",
                            r"NDCG@100000000=([0-9.]+)")

    # ---------------- our legs (subprocess CLIs, same files/recipe).
    # Subprocesses for the same reason as the reference legs: each leg
    # gets a fresh jax runtime, and an XLA-runtime abort (the fake-mesh
    # in-process CPU communicator can SIGABRT the whole process when a
    # collective misses its hard 40 s rendezvous window under 1-core
    # thread starvation — see the dp=4 note below) surfaces as a
    # readable assert instead of killing the pytest process.
    r["ours_s1"] = _run_our_stage("pointwise_trad", [
        "--train_path", src, "--dev_path", merged,
        "--epochs_num", str(S1["epochs"]), "--batch_size", str(S1["bs"]),
        "--learning_rate", str(S1["lr"]),
        "--report_steps", str(S1["report"]), "--mode", "reg",
        "--dp", "4",   # fake 8-device test env; bs=4 batches shard over 4
        "--output_model_path", str(out / "ours_s1.ckpt"),
        "--log_path", str(out / "ours_s1.txt"), "--seed", "7"])

    r["ours_s2"] = _run_our_stage("reward_trad", [
        "--train_path", merged, "--dev_path", merged,
        "--epochs_num", str(S2["epochs"]), "--batch_size", str(S2["bs"]),
        "--learning_rate", str(S2["lr"]),
        "--report_steps", str(S2["report"]), "--max_tags", "20",
        "--dp", "4",
        "--output_model_path", str(out / "ours_s2.ckpt"),
        "--log_path", str(out / "ours_s2.txt"), "--seed", "7"])

    r["ours_s3"] = _run_our_stage("ppo_trad", [
        "--train_path", merged, "--dev_path", merged,
        "--epochs_num", str(S3["epochs"]), "--batch_size", str(S3["bs"]),
        "--max_tags", "20",   # the reference dataset's fixed ctor width
        "--pretrained_model_path", str(out / "ours_s1.ckpt"),
        "--reward_model_path", str(out / "ours_s2.ckpt"),
        "--max_timesteps", "1",
        "--update_timesteps", str(S3["update_timesteps"]),
        "--value_clip", "0.5",
        "--kl_div_loss_weight", "0.001", "--entropy_weight", "0.001",
        "--learning_rate", str(S3["lr"]),
        "--critic_learning_rate", str(S3["lr"]),
        # dp=4, not 8: the fake-8-device in-process CPU communicator
        # deterministically aborts (rendezvous.cc:127 hard 40 s window,
        # 3/8 threads arriving) under this exact sustained
        # rollout+sweep workload on a 1-core host — an XLA CPU runtime
        # scheduling pathology, reproduced at dp=8 and absent at
        # dp<=4; real TPU collectives ride ICI and are unaffected
        "--dp", "4",
        "--output_model_path", str(out / "ours_s3.ckpt"),
        "--log_path", str(out / "ours_s3.txt"), "--seed", "7"])
    return r


pytestmark = pytest.mark.heavy


def test_stage1_end_metric_matches(ab):
    """Final best val NDCG@full of the complete stage-1 run."""
    assert abs(ab["ours_s1"] - ab["ref_s1"]) < 0.05, ab


def test_stage2_end_metric_matches(ab):
    """Final best pairwise accuracy of the complete stage-2 run. Both
    must also actually discriminate (well above chance) or the stage-3
    reward signal is meaningless. Tolerance: the two sides eval on
    INDEPENDENTLY sampled cross-class pair sets (20/query = 640 pairs
    each, different rng), so the binomial noise floor alone is
    sigma_diff ~= sqrt(2 * .25/640) ~= 0.028; 0.10 ~= 3.5 sigma on top
    of matched-but-independently-initialized training (measured
    |d| = 0.0375)."""
    assert ab["ref_s2"] > 0.65, ab
    assert ab["ours_s2"] > 0.65, ab
    assert abs(ab["ours_s2"] - ab["ref_s2"]) < 0.10, ab


def test_stage3_end_metric_matches(ab):
    """Best val NDCG@full over the complete LR2PPO run."""
    assert abs(ab["ours_s3"] - ab["ref_s3"]) < 0.05, ab


def test_stage3_lift_matches(ab):
    """The stage-3 lift over stage 1 agrees in sign and rough
    magnitude: PPO's effect on the end metric is the same on both
    sides (reference anchor: the ppo log's NDCG climb,
    logs/ppo_logs/ppo_pair_dataloader.txt 0.8046 -> 0.8479)."""
    ref_lift = ab["ref_s3"] - ab["ref_s1"]
    our_lift = ab["ours_s3"] - ab["ours_s1"]
    assert abs(our_lift - ref_lift) < 0.05, ab
    if abs(ref_lift) > 0.02:
        assert np.sign(our_lift) == np.sign(ref_lift), ab
