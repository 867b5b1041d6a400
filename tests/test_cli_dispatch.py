"""CLI package: dispatcher lists every reference launch script's
equivalent and each entry module imports and exposes main()."""

import importlib
import os
import subprocess
import sys

from lr2ppo_tpu.cli import ENTRY_POINTS

REFERENCE_SCRIPTS = [
    "pointwise", "reward_pair_dataloader", "ppo", "ppo_eval",
    "pointwise_trad", "pointwise_2data_trad", "pointwise_2data_infer_trad",
    "reward_trad", "ppo_trad", "ppo_eval_trad",
]


def test_every_reference_script_has_an_entry():
    for name in REFERENCE_SCRIPTS:
        assert name in ENTRY_POINTS


def test_entry_modules_import_and_have_main():
    for name in ENTRY_POINTS:
        mod = importlib.import_module(f"lr2ppo_tpu.cli.{name}")
        assert callable(getattr(mod, "main"))


def test_dispatcher_rejects_unknown():
    proc = subprocess.run(
        [sys.executable, "-m", "lr2ppo_tpu.cli", "not_a_thing"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 2
    assert "unknown entry" in proc.stdout


def test_dispatcher_usage():
    proc = subprocess.run(
        [sys.executable, "-m", "lr2ppo_tpu.cli"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 2
    assert "usage" in proc.stdout
