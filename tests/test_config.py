"""Config precedence tests: defaults < JSON < CLI (reference
tencentpretrain/utils/config.py:6-23 semantics)."""

import json

from lr2ppo_tpu.config import Config, load_hyperparam, parse_config


def test_defaults():
    cfg = Config()
    assert cfg.model.seq_length == 196
    assert cfg.model.num_heads == 8
    assert cfg.model.fusion_tokens == 212
    assert cfg.ppo.update_timesteps == 200
    assert cfg.optim.correct_bias is False


def test_json_overrides_defaults(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"seq_length": 128, "model": {"num_heads": 4},
                             "batch_size": 7}))
    cfg = load_hyperparam(Config(), str(p))
    assert cfg.model.seq_length == 128
    assert cfg.model.num_heads == 4
    assert cfg.batch_size == 7


def test_cli_overrides_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"seq_length": 128, "batch_size": 7}))
    cfg = parse_config([
        "--config_path", str(p), "--seq_length", "64",
        "--learning_rate", "1e-3", "--mode", "cls",
    ])
    assert cfg.model.seq_length == 64      # CLI wins
    assert cfg.batch_size == 7             # JSON survives
    assert cfg.optim.learning_rate == 1e-3
    assert cfg.model.mode == "cls"


def test_reference_compat_flags_accepted():
    cfg = parse_config([
        "--mask", "fully_visible", "--tokenizer", "bpe",
        "--vit_config_path", "models/vit/base-16-224_config.json",
        "--max_tags", "80", "--update_timesteps", "200",
        "--value_clip", "0.5", "--kl_div_loss_weight", "0.001",
    ])
    assert cfg.data.max_tags == 80
    assert cfg.ppo.value_clip == 0.5
    assert cfg.ppo.kl_div_loss_weight == 0.001


def test_tabular_fusion_tokens():
    cfg = Config()
    cfg = cfg.replace(model=cfg.model.__class__(family="tabular"))
    assert cfg.model.fusion_tokens == 2


def test_round2_flag_routes():
    from lr2ppo_tpu.config import parse_config

    cfg = parse_config([
        "--rank_margin", "0.05", "--grad_clip", "1.0",
        "--moment_dtype", "bfloat16", "--remat", "true",
        "--advantage_eps", "-0.2", "--device_memory_gb", "2.5",
        "--loader", "thread", "--preload", "never",
        "--item_dtype", "float32", "--num_workers", "3"])
    assert cfg.ppo.rank_margin == 0.05
    assert cfg.ppo.advantage_eps == -0.2
    assert cfg.ppo.device_memory_gb == 2.5
    assert cfg.optim.grad_clip == 1.0
    assert cfg.optim.moment_dtype == "bfloat16"
    assert cfg.model.remat is True
    assert cfg.data.loader == "thread"
    assert cfg.data.preload == "never"
    assert cfg.data.item_dtype == "float32"
    assert cfg.data.num_workers == 3


def test_rollout_int8_mode_normalization():
    """Tri-state flag: bool legacy forms, CLI boolean spellings, and
    'actor' (r5) all normalize; typos fail fast."""
    import pytest

    from lr2ppo_tpu.config import parse_config, rollout_int8_mode

    assert rollout_int8_mode(True) == "1"
    assert rollout_int8_mode(False) == "0"
    assert rollout_int8_mode("both") == "1"
    assert rollout_int8_mode("off") == "0"
    assert rollout_int8_mode("actor") == "actor"
    with pytest.raises(ValueError, match="rollout_int8"):
        rollout_int8_mode("ture")
    # CLI forms: bare switch == '1', explicit value routes through
    assert rollout_int8_mode(
        parse_config(["--rollout_int8"]).ppo.rollout_int8) == "1"
    assert rollout_int8_mode(
        parse_config(["--rollout_int8", "actor"]).ppo.rollout_int8) \
        == "actor"
    assert rollout_int8_mode(
        parse_config([]).ppo.rollout_int8) == "0"


def test_profile_fast_selects_production_preset():
    """VERDICT r2 #4: one flag reproduces the benched configuration."""
    from lr2ppo_tpu.config import parse_config

    cfg = parse_config(["--profile", "fast"])
    assert cfg.mesh.compute_dtype == "bfloat16"
    assert cfg.optim.moment_dtype == "bfloat16"
    assert cfg.model.hash_dropout is True
    # r5: actor-only int8 rollout twin is part of the fast preset
    from lr2ppo_tpu.config import rollout_int8_mode

    assert rollout_int8_mode(cfg.ppo.rollout_int8) == "actor"

    # explicit CLI flags outrank the profile
    cfg2 = parse_config(["--profile", "fast",
                         "--compute_dtype", "float32"])
    assert cfg2.mesh.compute_dtype == "float32"
    assert cfg2.optim.moment_dtype == "bfloat16"

    import pytest

    with pytest.raises(ValueError):
        parse_config(["--profile", "warp9"])


def test_bench_config_is_profile_fast(monkeypatch):
    """bench.py measures EXACTLY what `cli/ppo.py --profile fast` builds:
    same model config, same optimizer dtype, same compute dtype."""
    import dataclasses
    import importlib.util
    import os

    import jax.numpy as jnp

    from lr2ppo_tpu.config import ModelConfig, parse_config
    from lr2ppo_tpu.train.ppo import PPOTrainer

    for env in ("LR2PPO_BENCH_REMAT", "LR2PPO_BENCH_PALLAS",
                "LR2PPO_BENCH_HASH", "LR2PPO_BENCH_INT8"):
        monkeypatch.delenv(env, raising=False)
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    bcfg = bench.fast_config()
    ccfg = parse_config(["--profile", "fast", "--seq_length", "196",
                         "--max_imgs", "16", "--mode", "reg"])
    assert bcfg.model == ccfg.model
    assert bcfg.optim == ccfg.optim
    assert bcfg.mesh == ccfg.mesh
    # the fast profile's int8 frozen reward is part of the benched
    # configuration too
    assert bcfg.ppo == ccfg.ppo
    assert ccfg.ppo.reward_int8
    # and the trainer instantiates the models at the profile dtype
    trainer = PPOTrainer(ccfg.replace(model=dataclasses.replace(
        ModelConfig(), hash_dropout=True)), use_mesh=False)
    assert trainer.actor.dtype == jnp.bfloat16
