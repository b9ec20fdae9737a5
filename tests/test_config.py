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
