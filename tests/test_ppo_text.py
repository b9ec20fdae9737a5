"""Text-RL PPO e2e on a toy task — the analog of the reference's
arithmetic-sequence digit-completion e2e (tests/e2e/arithmetic_sequence/):
a tiny LLM + rule-based reward; the full loop must run, improve mechanics,
and score correctly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vla_rft_tpu.config import vla_rft_default_config
from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from vla_rft_tpu.parallel.mesh import MeshConfig, make_mesh
from vla_rft_tpu.trainer.ppo_trainer import PPOTrainer
from vla_rft_tpu.utils.reward_score import gsm8k, math as math_score
from vla_rft_tpu.workers.llm_rollout import LLMRolloutConfig, compute_log_probs, generate_sequences
from vla_rft_tpu.workers.reward_manager import NaiveRewardManager

VOCAB = 32
LLM_CFG = TransformerConfig(
    vocab_size=VOCAB, hidden_size=32, intermediate_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
    attn_impl="xla",
)


class ToyTokenizer:
    """Digits-as-tokens; id 2 = EOS, id 0 = pad."""

    def decode(self, ids):
        return " ".join(str(i) for i in ids)

    def encode(self, text):
        return [int(t) % VOCAB for t in text.split() if t.isdigit()] or [3]


class ToyDataset:
    def __init__(self, P=12):
        self.P = P
        self._rng = np.random.default_rng(0)

    def sample_batch(self, batch_size):
        ids = np.zeros((batch_size, self.P), np.int32)
        for i in range(batch_size):
            n = int(self._rng.integers(3, self.P))
            ids[i, self.P - n :] = self._rng.integers(3, VOCAB, n)  # left-padded
        return {
            "input_ids": ids,
            "data_sources": ["toy"] * batch_size,
            "ground_truths": ["7"] * batch_size,
        }


def toy_score(data_source, text, gt, extra=None):
    return 1.0 if gt in text.split() else 0.0


def test_gsm8k_scorer():
    assert gsm8k.compute_score("blah #### 42", "42") == 1.0
    assert gsm8k.compute_score("blah #### 41", "42") == 0.0
    assert gsm8k.compute_score("no answer", "42") == 0.0
    assert gsm8k.compute_score("x #### 1,234", "1234") == 1.0
    assert gsm8k.extract_solution("a 12 then 15", method="flexible") == "15"


def test_math_scorer():
    assert math_score.compute_score("so \\boxed{\\frac{1}{2}}", "\\frac{1}{2}") == 1.0
    assert math_score.compute_score("\\boxed{3}", "4") == 0.0
    assert math_score.compute_score("nothing", "4") == 0.0


def test_llm_rollout_left_padding_and_logp():
    llm = Decoder(LLM_CFG)
    params = llm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    cfg = LLMRolloutConfig(response_length=6, eos_token_id=2, pad_token_id=0, do_sample=False)
    prompts = jnp.asarray(
        [[0, 0, 5, 6, 7, 8], [3, 4, 5, 6, 7, 8]], jnp.int32
    )  # row 0 left-padded by 2
    out = generate_sequences(llm, params, jax.random.key(1), prompts, cfg)
    assert out["responses"].shape == (2, 6)
    # greedy decode of row1 must match an unpadded manual argmax rollout
    seq = [3, 4, 5, 6, 7, 8]
    for _ in range(6):
        logits, _, _ = llm.apply(params, jnp.asarray([seq], jnp.int32))
        seq.append(int(jnp.argmax(logits[0, -1])))
    resp_mask = np.asarray(out["response_mask"][1], bool)
    got = np.asarray(out["responses"][1])
    expected = np.asarray(seq[6:])
    # compare until EOS (post-EOS positions are pad)
    np.testing.assert_array_equal(got[resp_mask], expected[: resp_mask.sum()])
    # left-padded row: logp of its own sampled tokens is finite & high
    lp = compute_log_probs(
        llm, params, out["input_ids"], out["attention_mask"], out["position_ids"], 6
    )[0]
    assert np.isfinite(np.asarray(lp)).all()
    # padding invariance: row0's response must equal rollout of its unpadded prompt
    prompts_nopad = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    cfg2 = LLMRolloutConfig(response_length=6, eos_token_id=2, pad_token_id=0, do_sample=False)
    out2 = generate_sequences(llm, params, jax.random.key(1), prompts_nopad, cfg2)
    np.testing.assert_array_equal(np.asarray(out["responses"][0]), np.asarray(out2["responses"][0]))


@pytest.mark.parametrize("estimator", ["grpo", "gae"])
def test_ppo_text_trainer_step(estimator):
    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.actor_rollout_ref.actor.optim.lr = 1e-3
    c.algorithm.adv_estimator = estimator
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.trainer.total_training_steps = 1
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    trainer = PPOTrainer(
        c, LLM_CFG, ToyTokenizer(), ToyDataset(), mesh=mesh,
        reward_manager=NaiveRewardManager(ToyTokenizer(), compute_score=toy_score),
    )
    before = np.asarray(jax.tree_util.tree_leaves(trainer.actor_params)[1]).copy()
    m = trainer.training_step(trainer.dataset.sample_batch(2), jax.random.key(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert "actor/pg_loss" in m and "critic/score/mean" in m
    if estimator == "gae":
        assert "critic/vf_loss" in m
    after = np.asarray(jax.tree_util.tree_leaves(trainer.actor_params)[1])
    assert not np.allclose(before, after)


def test_prefix_shared_rollout_matches_plain():
    """sglang-analog prompt-prefix sharing: generating the n rollouts of each
    unique prompt against one shared prefilled prompt KV must produce the
    SAME sequences as the plain per-row cache path (same rng, greedy and
    sampled), including left-padded prompts."""
    from vla_rft_tpu.workers.llm_rollout import LLMRolloutConfig, generate_sequences
    from vla_rft_tpu.models.transformer import Decoder

    llm = Decoder(LLM_CFG)
    params = llm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    uniq = jnp.asarray([[0, 0, 5, 6, 7, 8], [3, 4, 5, 6, 7, 8]], jnp.int32)
    n = 3
    prompts = jnp.repeat(uniq, n, axis=0)  # (6, 6) repeat-contiguous
    for do_sample in (False, True):
        cfg = LLMRolloutConfig(
            response_length=6, eos_token_id=2, pad_token_id=0, do_sample=do_sample
        )
        plain = generate_sequences(llm, params, jax.random.key(9), prompts, cfg)
        shared = generate_sequences(
            llm, params, jax.random.key(9), prompts, cfg, prefix_share_n=n
        )
        np.testing.assert_array_equal(
            np.asarray(plain["responses"]), np.asarray(shared["responses"]),
            err_msg=f"do_sample={do_sample}",
        )
        np.testing.assert_array_equal(
            np.asarray(plain["attention_mask"]), np.asarray(shared["attention_mask"])
        )


def test_ppo_trainer_prefix_share_step():
    """PPO trainer step with rollout.prefix_share=True runs end-to-end."""
    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.rollout.prefix_share = True
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.algorithm.adv_estimator = "grpo"
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.trainer.total_training_steps = 1
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    trainer = PPOTrainer(
        c, LLM_CFG, ToyTokenizer(), ToyDataset(), mesh=mesh,
        reward_manager=NaiveRewardManager(ToyTokenizer(), compute_score=toy_score),
    )
    m = trainer.training_step(trainer.dataset.sample_batch(2), jax.random.key(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_ppo_balance_batch_dp2():
    """trainer.balance_batch reorders rows so contiguous dp shards carry
    near-equal token sums (ray_trainer._balance_batch:787-802) and logs
    global_seqlen/* stats."""
    c = vla_rft_default_config()
    c.data.train_batch_size = 4
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 8
    c.algorithm.adv_estimator = "grpo"
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.trainer.total_training_steps = 1
    c.trainer.balance_batch = True
    c.mesh = {"dp": 2, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=2), devices=jax.devices()[:2])
    trainer = PPOTrainer(
        c, LLM_CFG, ToyTokenizer(), ToyDataset(), mesh=mesh,
        reward_manager=NaiveRewardManager(ToyTokenizer(), compute_score=toy_score),
    )
    m = trainer.training_step(trainer.dataset.sample_batch(4), jax.random.key(0))
    assert "global_seqlen/minmax_diff" in m
    assert (
        m["global_seqlen/balanced_max"] - m["global_seqlen/balanced_min"]
        <= m["global_seqlen/max"] - m["global_seqlen/min"]
    )
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_fire_sampling_runs():
    from vla_rft_tpu.workers.llm_rollout import LLMRolloutConfig, generate_sequences
    from vla_rft_tpu.models.transformer import Decoder

    llm = Decoder(LLM_CFG)
    params = llm.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    cfg = LLMRolloutConfig(
        response_length=4, eos_token_id=2, pad_token_id=0,
        use_fire_sampling=True, fire_temperature=3.0,
    )
    prompts = jnp.asarray([[3, 4, 5, 6]], jnp.int32)
    out = generate_sequences(llm, params, jax.random.key(1), prompts, cfg)
    assert out["responses"].shape == (1, 4)


def test_reward_model_scoring():
    from vla_rft_tpu.models.reward_model import SequenceRewardModel, compute_rm_score

    rm = SequenceRewardModel(LLM_CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 30, (2, 12)), jnp.int32)
    params = rm.init(jax.random.key(0), ids)
    mask = jnp.ones((2, 12), jnp.int32)
    mask = mask.at[1, 10:].set(0)  # row 1: response ends early
    pos = jnp.cumsum(mask, axis=1) - 1
    scores = compute_rm_score(rm, params, ids, mask, pos, response_length=6)
    s = np.asarray(scores)
    assert s.shape == (2, 6)
    assert (s[0, :-1] == 0).all() and s[0, -1] != 0
    # row 1 valid response length = 4 -> score at index 3
    assert s[1, 3] != 0 and (np.delete(s[1], 3) == 0).all()


def test_trajectory_tracker(tmp_path):
    from vla_rft_tpu.utils.trajectory_tracker import TrajectoryTracker

    tt = TrajectoryTracker(str(tmp_path))
    x = {"a": np.arange(4.0), "b": np.ones((2, 2))}
    tt.dump("rollout", 3, x)
    back = tt.load("rollout", 3)
    np.testing.assert_array_equal(back["a"], x["a"])
    d = tt.diff("rollout", 3, {"a": x["a"] + 0.5})
    assert abs(d["a"] - 0.5) < 1e-6


def test_dapo_overlong_penalty():
    from vla_rft_tpu.workers.reward_manager import DAPORewardManager

    rm = DAPORewardManager(
        ToyTokenizer(), compute_score=lambda *a: 1.0,
        max_response_length=10, overlong_buffer=4, penalty_factor=1.0,
    )
    resp = np.zeros((2, 10), np.int64)
    mask = np.zeros((2, 10), np.int64)
    mask[0, :5] = 1   # short: within budget, no penalty
    mask[1, :9] = 1   # 3 tokens into the overlong buffer
    r = rm(resp, mask, ["toy", "toy"], ["x", "x"])
    assert abs(r[0, 4] - 1.0) < 1e-6
    assert abs(r[1, 8] - (1.0 - 3 / 4)) < 1e-6


def test_math_dapo_scorer():
    from vla_rft_tpu.utils.reward_score import default_compute_score, has_scorer, math_dapo

    assert math_dapo.compute_score("thus \\boxed{1{,}234}".replace("{,}", ","), "1234") == 1.0
    assert math_dapo.compute_score("\\boxed{\\frac{1}{2}} then \\boxed{3}", "3") == 1.0
    assert math_dapo.compute_score("Answer: 42", "42") == 1.0
    assert math_dapo.compute_score("\\boxed{41}", "42") == -1.0
    assert math_dapo.compute_score("no answer at all", "42") == -1.0
    assert has_scorer("math_dapo") and has_scorer("openai/gsm8k") and not has_scorer("toy")
    assert default_compute_score("math_dapo", "\\boxed{7}", "7") == 1.0


def test_ppo_model_based_reward_model():
    """RM-enabled PPO: sources without a rule scorer are scored by the
    SequenceRewardModel; rule sources keep rule scores (fsdp_workers.py
    RewardModelWorker + naive manager rm_scores fallback)."""
    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.algorithm.adv_estimator = "grpo"
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.reward_model.enable = True
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    trainer = PPOTrainer(
        c, LLM_CFG, ToyTokenizer(), ToyDataset(), mesh=mesh,
        reward_manager=NaiveRewardManager(ToyTokenizer(), compute_score=lambda *a: 5.0),
    )
    assert trainer.rm is not None
    batch = trainer.dataset.sample_batch(2)
    batch["data_sources"] = ["toy", "openai/gsm8k"]  # no scorer / rule scorer
    m = trainer.training_step(batch, jax.random.key(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # rule rows scored 5.0 each (2 rollouts), RM rows are model outputs (!= 5)
    assert m["critic/score/mean"] != pytest.approx(5.0)


def test_ppo_remax_estimator_step():
    """ReMax: greedy-rollout baseline per unique prompt subtracted from the
    sampled rollouts' returns (ray_trainer remax branch + core_algos)."""
    c = vla_rft_default_config()
    c.data.train_batch_size = 2
    c.actor_rollout_ref.rollout.n = 2
    c.actor_rollout_ref.rollout.response_length = 6
    c.actor_rollout_ref.actor.ppo_mini_batch_size = 4
    c.algorithm.adv_estimator = "remax"
    c.processor.eos_token_id = 2
    c.processor.pad_token_id = 0
    c.mesh = {"dp": 1, "fsdp": 1, "tp": 1, "sp": 1}
    mesh = make_mesh(MeshConfig(dp=1), devices=jax.devices()[:1])
    trainer = PPOTrainer(
        c, LLM_CFG, ToyTokenizer(), ToyDataset(), mesh=mesh,
        reward_manager=NaiveRewardManager(ToyTokenizer(), compute_score=toy_score),
    )
    m = trainer.training_step(trainer.dataset.sample_batch(2), jax.random.key(0))
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert "actor/pg_loss" in m


def test_hf_tokenizer_pad_fix():
    from vla_rft_tpu.utils.tokenizer import set_pad_token_id

    class T:
        pad_token_id = None
        pad_token = None
        eos_token_id = 7
        eos_token = "<eos>"

    t = T()
    with pytest.warns(UserWarning):
        set_pad_token_id(t)
    assert t.pad_token_id == 7 and t.pad_token == "<eos>"


def test_prime_code_scorer_stdin_stdout():
    from vla_rft_tpu.utils.reward_score import prime_code

    sol = "answer:\n```python\nn = int(input())\nprint(n * 2)\n```"
    cases = {"inputs": ["3\n", "10\n"], "outputs": ["6\n", "20\n"]}
    score, meta = prime_code.compute_score(sol, cases)
    assert score == 1.0 and meta["passed"] == 2

    # partial pass -> continuous fraction (the registry passes
    # continuous=True; the scorer itself defaults False like the reference)
    bad = "```python\nn = int(input())\nprint(n * 2 if n < 5 else 0)\n```"
    score, meta = prime_code.compute_score(bad, cases, continuous=True)
    assert score == 0.5 and meta["passed"] == 1
    score, _ = prime_code.compute_score(bad, cases)
    assert score == 0.0


def test_prime_code_bounds_failing_runs(monkeypatch):
    """A failing generation must not execute every case: the scored loop is
    capped at 10 (continuous) / first failure (binary) — the reference's
    'enormous test cases' guard."""
    from vla_rft_tpu.utils.reward_score import prime_code

    calls = []
    real = prime_code._run_one

    def counting(code, inp, fn_name, timeout):
        calls.append(inp)
        return real(code, inp, fn_name, timeout)

    monkeypatch.setattr(prime_code, "_run_one", counting)
    bad = "```python\nprint('wrong')\n```"
    cases = {"inputs": [f"{i}\n" for i in range(30)], "outputs": ["x"] * 30}
    score, _ = prime_code.compute_score(bad, cases, continuous=True)
    assert score == 0.0 and len(calls) == 10
    calls.clear()
    score, _ = prime_code.compute_score(bad, cases, continuous=False)
    assert score == 0.0 and len(calls) == 1
    # registry dispatch uses continuous scoring for code sources
    calls.clear()
    from vla_rft_tpu.utils.reward_score import default_compute_score

    half = "```python\nn = int(input())\nprint(n * 2 if n < 1 else 0)\n```"
    cases2 = {"inputs": ["0\n", "3\n"], "outputs": ["0\n", "6\n"]}
    assert default_compute_score("apps", half, __import__("json").dumps(cases2)) == 0.5


def test_prime_code_scorer_fn_name_and_guards():
    import json

    from vla_rft_tpu.utils.reward_score import prime_code

    sol = "```python\ndef add(a, b):\n    return a + b\n```"
    cases = json.dumps({"inputs": [[1, 2], [5, 5]], "outputs": [3, 10], "fn_name": "add"})
    score, _ = prime_code.compute_score(sol, cases)
    assert score == 1.0

    # crash and timeout are failures, not exceptions
    score, _ = prime_code.compute_score("```python\nraise SystemExit(3)\n```", cases)
    assert score == 0.0
    score, meta = prime_code.compute_score("no code here", "not json {")
    assert score == 0.0 and "error" in meta


def test_geo3k_scorer():
    from vla_rft_tpu.utils.reward_score import default_compute_score, geo3k

    assert geo3k.compute_score("thus \\boxed{12.5}", "12.50") == 1.0
    assert geo3k.compute_score("\\boxed{12.5}", "13") == 0.0
    assert default_compute_score("hiyouga/geometry3k", "\\boxed{2}", "2") == 1.0
    # registry unwraps prime_code's (score, metadata) tuple
    s = default_compute_score(
        "apps", "```python\nprint(int(input())+1)\n```",
        '{"inputs": ["1\\n"], "outputs": ["2\\n"]}',
    )
    assert s == 1.0


def test_prime_math_scorer():
    """sympy-based grader (reference prime_math/__init__.py:408-430 tuple
    contract + grader.py equivalence tiers)."""
    from vla_rft_tpu.utils.reward_score import prime_math

    # boxed + exact
    ok, fmt, ext = prime_math.compute_score("thus \\boxed{42}", "42")
    assert ok and ext == "42"
    # answer-marker extraction
    ok, _, _ = prime_math.compute_score("The answer is 1,234.", "1234")
    assert ok
    # fraction vs decimal, latex frac vs plain
    assert prime_math.compute_score("\\boxed{\\frac{1}{2}}", "0.5")[0]
    assert prime_math.compute_score("\\boxed{0.5}", "1/2")[0]
    # symbolic equivalence through sympy
    assert prime_math.compute_score("answer: 2*(3+4)", "14")[0]
    assert prime_math.compute_score("\\boxed{\\sqrt{4}}", "2")[0]
    # pi substitution variants
    assert prime_math.compute_score("\\boxed{2\\pi}", "6.28")[0]
    # units stripped
    assert prime_math.compute_score("\\boxed{5 \\text{ cm}}", "5")[0]
    # tuples element-wise
    assert prime_math.compute_score("\\boxed{(1, 2)}", "(1,2)")[0]
    assert not prime_math.compute_score("\\boxed{(1, 2)}", "(1,3)")[0]
    # wrong / missing answers
    assert not prime_math.compute_score("\\boxed{41}", "42")[0]
    assert not prime_math.compute_score("no digits here", "42")[0]
    # format flag requires the Step 2 + boxed template
    assert prime_math.compute_score("Step 2: thus \\boxed{7}", "7")[1]
    assert not prime_math.compute_score("\\boxed{7}", "7")[1]


def test_math_verify_scorer_and_registry():
    """Native math-verify analog + un-aliased registry entries."""
    from vla_rft_tpu.utils.reward_score import (
        _REGISTRY,
        default_compute_score,
        math_verify,
    )

    assert _REGISTRY["math_verify"] == "math_verify"  # no longer math_dapo
    assert _REGISTRY["prime_math"] == "prime_math"
    assert math_verify.compute_score("The answer is $\\frac{1}{2}$", "1/2") == 1.0
    assert math_verify.compute_score("so we get \\boxed{3.5}", "7/2") == 1.0
    assert math_verify.compute_score("equals 14", "2*(3+4)") == 1.0
    assert math_verify.compute_score("\\boxed{41}", "42") == 0.0
    assert math_verify.compute_score("nothing numeric", "42") == 0.0
    assert default_compute_score("math_verify", "\\boxed{9}", "9") == 1.0
    assert default_compute_score("numina_synthetic_math", "answer: 8", "8") == 1.0


def test_compute_score_with_info_pred_channel():
    from vla_rft_tpu.utils.reward_score import compute_score_with_info

    score, info = compute_score_with_info("prime_math", "thus \\boxed{42}", "42")
    assert score == 1.0 and info["pred"] == "42"
    score, info = compute_score_with_info("openai/gsm8k", "x #### 7", "7")
    assert score == 1.0 and info == {}
