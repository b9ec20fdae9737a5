from vla_rft_tpu.config import Config, vla_rft_default_config


def test_default_config_keys():
    c = vla_rft_default_config()
    assert c.processor.visual_token_num == 4375
    assert c.processor.bos_token_id == 9006
    assert c.actor_rollout_ref.actor.clip_ratio_c == 3.0
    assert c.world_model_rollout.rollout.interact_max_tokens == 64
    assert c.data.max_prompt_length == 1095


def test_overrides():
    c = vla_rft_default_config()
    c.apply_overrides(
        [
            "trainer.total_training_steps=400",
            "actor_rollout_ref.rollout.n=16",
            "trainer.loss_weight.mse=0",
            "processor.tokenizer.name=ctx_cnn",
            "algorithm.uniform_std=True",
            "world_model_rollout.model.path=null",
        ]
    )
    assert c.trainer.total_training_steps == 400
    assert c.actor_rollout_ref.rollout.n == 16
    assert c.algorithm.uniform_std is True
    assert c.world_model_rollout.model.path is None


def test_get_set_path_and_copy():
    c = Config({"a": {"b": 1}})
    assert c.get_path("a.b") == 1
    assert c.get_path("a.zz", 5) == 5
    c.set_path("a.c.d", 2)
    assert c.a.c.d == 2
    c2 = c.copy()
    c2.a.b = 99
    assert c.a.b == 1


def test_validate_config():
    from vla_rft_tpu.trainer.config_check import assert_valid_config, validate_config

    c = vla_rft_default_config()
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 16
    assert validate_config(c, n_devices=1) == []
    assert_valid_config(c)

    bad = vla_rft_default_config()
    bad.data.max_response_length = 100  # breaks the ctx_msp layout
    problems = validate_config(bad)
    assert any("max_response_length" in p for p in problems)

    bad2 = vla_rft_default_config()
    bad2.actor_rollout_ref.actor.ppo_mini_batch_size = 5  # 256 % 5 != 0
    assert any("mini" in p.lower() or "divide" in p for p in validate_config(bad2))
