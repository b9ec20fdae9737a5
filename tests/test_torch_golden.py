"""Numerical converter validation against the reference torch implementation.

Loads the reference's OWN torch modules (prismatic action head / DiT /
projectors, ivideogpt FSQ) from /root/reference by file path — bypassing the
heavy prismatic package __init__ and stubbing only `timm.models.
vision_transformer.Mlp` (two Linears + GELU, the public timm layout) —
runs them with seeded random weights, converts those weights with
tools/convert_weights, and asserts the flax towers produce the same numbers.
A converter that permutes or transposes any weight fails these tests with
O(1) errors (shape-only tests in test_convert.py cannot catch that)."""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/train/verl/vla-adapter/openvla-oft/prismatic"
IVG = "/root/reference/train/verl/ivideogpt"


def _stub_timm():
    class Mlp(torch.nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=torch.nn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = torch.nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.drop1 = torch.nn.Dropout(drop)
            self.norm = torch.nn.Identity()
            self.fc2 = torch.nn.Linear(hidden_features, out_features)
            self.drop2 = torch.nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))

    class PatchEmbed(torch.nn.Module):
        pass

    import importlib.machinery

    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Mlp, vt.PatchEmbed = Mlp, PatchEmbed
    models = types.ModuleType("timm.models")
    models.vision_transformer = vt
    timm = types.ModuleType("timm")
    timm.models = models
    timm.__version__ = "0.0.0-stub"
    # transformers probes timm via find_spec; a spec-less module breaks it
    for m in (timm, models, vt):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, None)
    sys.modules.setdefault("timm", timm)
    sys.modules["timm.models"] = models
    sys.modules["timm.models.vision_transformer"] = vt


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_prismatic():
    _stub_timm()
    for pkg in ("prismatic", "prismatic.models", "prismatic.vla"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    _load("prismatic.vla.constants", f"{REF}/vla/constants.py")
    _load("prismatic.models.transformer_utils", f"{REF}/models/transformer_utils.py")
    dt = _load("prismatic.models.diffusion_transformer", f"{REF}/models/diffusion_transformer.py")
    ah = _load("prismatic.models.action_heads", f"{REF}/models/action_heads.py")
    pj = _load("prismatic.models.projectors", f"{REF}/models/projectors.py")
    return dt, ah, pj


def _sd(mod):
    return {k: v.detach().float() for k, v in mod.state_dict().items()}


def test_projector_converter_exact(ref_prismatic):
    """ProprioProjector / NoisyActionProjector convert bit-faithfully (f32)."""
    _, _, pj = ref_prismatic
    from tools.convert_weights import _mlp_projector
    from vla_rft_tpu.models.action_head import MLPProjector

    torch.manual_seed(1)
    tp = pj.ProprioProjector(llm_dim=64, proprio_dim=8).float().eval()
    x = torch.randn(3, 8)
    with torch.no_grad():
        want = tp(x).numpy()

    ours = MLPProjector(out_dim=64, dtype=jnp.float32)
    params = {"params": _mlp_projector(_sd(tp), "")}
    got = np.asarray(ours.apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    nap = pj.NoisyActionProjector(llm_dim=64).float().eval()
    xa = torch.randn(3, 56, 1)
    with torch.no_grad():
        want = nap(xa).numpy()
    params = {"params": _mlp_projector(_sd(nap), "")}
    got = np.asarray(ours.apply(params, jnp.asarray(xa.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flow_head_golden(ref_prismatic):
    """Full predict_flow (noisy-action projection -> DiT w/ cross-attn context
    + proprio + adaLN timesteps) matches the reference at real LIBERO size.

    The reference hardcodes bfloat16 casts inside predict_flow
    (action_heads.py:110-121), so both sides run bf16; tolerance covers
    bf16 resolution, not layout errors (a permuted weight gives O(1) drift)."""
    _, ah, pj = ref_prismatic
    from tools import convert_weights as cw
    from vla_rft_tpu.models.action_head import ActionExpert, ActionHeadConfig

    torch.manual_seed(0)
    head = ah.FlowMatchingActionHead(input_dim=896, hidden_dim=896, action_dim=7)
    prop = pj.ProprioProjector(llm_dim=896, proprio_dim=8)
    noisy_p = pj.NoisyActionProjector(llm_dim=896)

    # adaLN-Zero leaves the DiT's final/modulation layers zero-initialized —
    # a freshly-built reference head outputs exactly 0, which would hide any
    # converter bug.  Re-randomize EVERY tensor (seeded) before loading the
    # same values into both implementations.
    def randomize(mod, seed):
        g = torch.Generator().manual_seed(seed)
        sd = {
            # temp_embed is a fixed sincos table stored as a buffer-parameter;
            # our side regenerates it, so it must keep its true value
            k: (v.clone() if "temp_embed" in k else torch.randn(v.shape, generator=g) * 0.05)
            for k, v in mod.state_dict().items()
        }
        mod.load_state_dict(sd)
        return {k: v.clone() for k, v in sd.items()}

    head_sd = randomize(head, 10)
    prop_sd = randomize(prop, 11)
    noisy_sd = randomize(noisy_p, 12)
    head, prop, noisy_p = (m.to(torch.bfloat16).eval() for m in (head, prop, noisy_p))

    B, S = 2, 56  # 8 actions x 7 dims of VLM action-token hidden states
    rng = np.random.default_rng(0)
    hidden = rng.standard_normal((B, S, 896), np.float32)
    noisy = rng.standard_normal((B, 8, 7), np.float32)
    t = rng.uniform(0.1, 0.9, (B,)).astype(np.float32)
    proprio = rng.standard_normal((B, 8), np.float32)

    with torch.no_grad():
        want = head.predict_flow(
            torch.from_numpy(hidden).to(torch.bfloat16),
            noisy_actions=torch.from_numpy(noisy).to(torch.bfloat16),
            timestep_embeddings=torch.from_numpy(t)[:, None].to(torch.bfloat16),
            noisy_action_projector=noisy_p,
            proprio=torch.from_numpy(proprio),
            proprio_projector=prop,
        ).float().numpy()

    cfg = ActionHeadConfig(llm_dim=896, dtype=jnp.bfloat16)
    expert = ActionExpert(cfg)
    h, na, tt, pp = map(jnp.asarray, (hidden, noisy, t, proprio))
    base = jax.eval_shape(lambda: expert.init(jax.random.key(0), h, na, tt, pp))
    conv = cw.convert_action_expert(head_sd, None, prop_sd, noisy_sd, cfg)
    conv["params"]["sigma_net"] = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), base["params"]["sigma_net"]
    )
    got = np.asarray(
        expert.apply(conv, h, na, tt, pp, method=expert.predict_flow), np.float32
    )
    assert got.shape == want.shape == (B, 8, 7)
    # bf16 end-to-end: compare direction + magnitude, not bits
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.05, (
        f"mean rel err {np.abs(got - want).mean() / denom:.3f}"
    )
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999, f"correlation {corr}"


def test_fsq_golden():
    """Our FSQ quantize/codes round-trip matches the reference
    finite_scalar_quantize.py (pure torch+einops, imported directly)."""
    fsq_mod = _load("ref_fsq", f"{IVG}/tokenizer/finite_scalar_quantize.py")
    from vla_rft_tpu.models.fsq import FSQ as OurFSQ, get_fsq_levels

    levels = get_fsq_levels(12)  # [7,5,5,5,5] -> 4375 codes (the run's dyn vocab)
    ref = fsq_mod.FSQ(levels=levels)
    our = OurFSQ(levels=tuple(levels))

    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 7, len(levels)), np.float32)
    with torch.no_grad():
        q_ref, idx_ref = ref(torch.from_numpy(z))
    q_our = our.quantize(jnp.asarray(z))
    idx_our = our.codes_to_indices(q_our)
    np.testing.assert_allclose(np.asarray(q_our), q_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_our), idx_ref.numpy())
    # codes -> vectors inverse agrees too
    vecs_ref = ref.indices_to_codes(idx_ref)
    vecs_our = our.indices_to_codes(jnp.asarray(idx_ref.numpy()))
    np.testing.assert_allclose(np.asarray(vecs_our), vecs_ref.numpy(), rtol=1e-5, atol=1e-6)
