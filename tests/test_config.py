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
