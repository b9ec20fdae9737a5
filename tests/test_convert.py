"""Weight-converter parity: HF transformers forward == our Decoder forward
after conversion (tiny random LLaMA and Qwen2).  This is the fidelity check
SURVEY flags as a hard part (weight conversion for the Qwen2.5 backbone and
the HF LLaMA world model)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_rft_tpu.models.transformer import Decoder, TransformerConfig
from tools.convert_weights import convert_hf_decoder


def _compare(hf_model, cfg, atol=2e-4):
    import torch

    sd = hf_model.state_dict()
    params = convert_hf_decoder(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    dec = Decoder(cfg)

    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 9))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.float().numpy()
    logits, _, _ = dec.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=atol, rtol=1e-3)


def test_llama_conversion_matches_hf():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, rms_norm_eps=1e-6,
        tie_word_embeddings=False, rope_theta=10000.0, attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=97, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )
    _compare(hf, cfg)


def test_qwen2_conversion_matches_hf():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=131, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-6,
        tie_word_embeddings=True, rope_theta=1_000_000.0, attn_implementation="eager",
    )
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = TransformerConfig(
        vocab_size=131, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, qkv_bias=True, tie_word_embeddings=True,
        rope_theta=1_000_000.0, dtype=jnp.float32, param_dtype=jnp.float32,
        attn_impl="xla",
    )
    _compare(hf, cfg)


def test_wm_llama_real_config_shapes():
    """The real WM config (24L/1024h vocab 9008) converts shape-consistently
    from an HF-like random state dict (no full forward — just tree shapes)."""
    cfg = TransformerConfig.wm_llama(vocab_size=9008)
    rng = np.random.default_rng(0)
    sd = {}
    D, I, nh, hd = 1024, 4096, 16, 64
    sd["model.embed_tokens.weight"] = rng.normal(size=(9008, D)).astype(np.float32)
    sd["model.norm.weight"] = np.ones(D, np.float32)
    sd["lm_head.weight"] = rng.normal(size=(9008, D)).astype(np.float32)
    for i in range(24):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attn.q_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = rng.normal(size=(I, D)).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = rng.normal(size=(I, D)).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = rng.normal(size=(D, I)).astype(np.float32)
    params = convert_hf_decoder(sd, cfg)
    # must match a freshly initialized tree's structure+shapes
    dec = Decoder(cfg)
    ref = dec.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert len(ref_flat) == len(got_flat)
    for (pa, a), (pb, bb) in zip(ref_flat, got_flat):
        assert pa == pb
        assert tuple(a.shape) == tuple(bb.shape), f"{pa}: {a.shape} vs {bb.shape}"


def test_vit_converter_shapes():
    """timm-style key names convert into the ViT tree (shape check)."""
    from vla_rft_tpu.models.vit import ViT, ViTConfig
    from tools.convert_weights import convert_timm_vit

    cfg = ViTConfig.dinov2_large_reg4(
        image_size=28, patch_size=14, hidden_size=16, depth=3, num_heads=2,
        mlp_dim=32, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    D = 16
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(D, 3, 14, 14)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(D, np.float32),
        "pos_embed": rng.normal(size=(1, 4 + 1, D)).astype(np.float32),
        "cls_token": np.zeros((1, 1, D), np.float32),
        "reg_token": np.zeros((1, 4, D), np.float32),
    }
    for i in range(cfg.depth - 1):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(D, np.float32)
        sd[b + "norm1.bias"] = np.zeros(D, np.float32)
        sd[b + "norm2.weight"] = np.ones(D, np.float32)
        sd[b + "norm2.bias"] = np.zeros(D, np.float32)
        sd[b + "attn.qkv.weight"] = rng.normal(size=(3 * D, D)).astype(np.float32)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * D, np.float32)
        sd[b + "attn.proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        sd[b + "attn.proj.bias"] = np.zeros(D, np.float32)
        sd[b + "mlp.fc1.weight"] = rng.normal(size=(32, D)).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros(32, np.float32)
        sd[b + "mlp.fc2.weight"] = rng.normal(size=(D, 32)).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros(D, np.float32)
        sd[b + "ls1.gamma"] = np.full(D, 1e-5, np.float32)
        sd[b + "ls2.gamma"] = np.full(D, 1e-5, np.float32)
    params = convert_timm_vit(sd, cfg)

    vit = ViT(cfg)
    ref = vit.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), ref)["params"]
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), params)
    assert set(ref_shapes.keys()) == set(got_shapes.keys())
    for k in ref_shapes:
        flat_a = jax.tree_util.tree_leaves(ref_shapes[k])
        flat_b = jax.tree_util.tree_leaves(got_shapes[k])
        assert flat_a == flat_b, f"shape mismatch under {k}"
    # converted params actually run
    out = vit.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.zeros((1, 28, 28, 3)))
    assert out.shape == (1, 4, 16)


def _synth_conv(rng, cin, cout, k=3):
    return {
        "weight": rng.normal(size=(cout, cin, k, k)).astype(np.float32),
        "bias": np.zeros(cout, np.float32),
    }


def test_compressive_vq_converter_shapes():
    """Synthetic torch-style state dict (ivideogpt module names) converts to
    a tree matching our CompressiveVQModelFSQ init exactly."""
    from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ
    from tools.convert_weights import convert_compressive_vq

    rng = np.random.default_rng(0)
    chans = (8, 16)
    lat = 4
    model = CompressiveVQModelFSQ(
        block_out_channels=chans, layers_per_block=1, latent_channels=lat,
        norm_num_groups=4, resolution=32, ctx_res=(16, 16), dyn_res=(4, 4),
        max_att_resolution=16,
    )
    px = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    ref = model.init(jax.random.key(0), px)

    sd = {}

    def add(prefix, key, arrs):
        for suffix, a in arrs.items():
            sd[f"{prefix}{key}.{suffix}"] = a

    def resnet(p, cin, cout):
        add(p, "norm1", {"weight": np.ones(cin, np.float32), "bias": np.zeros(cin, np.float32)})
        add(p, "conv1", _synth_conv(rng, cin, cout))
        add(p, "norm2", {"weight": np.ones(cout, np.float32), "bias": np.zeros(cout, np.float32)})
        add(p, "conv2", _synth_conv(rng, cout, cout))
        if cin != cout:
            add(p, "conv_shortcut", _synth_conv(rng, cin, cout, k=1))

    def mid(p, ch):
        resnet(p + "resnets.0.", ch, ch)
        resnet(p + "resnets.1.", ch, ch)
        a = p + "attentions.0."
        add(a, "group_norm", {"weight": np.ones(ch, np.float32), "bias": np.zeros(ch, np.float32)})
        for lin in ("to_q", "to_k", "to_v"):
            add(a, lin, {"weight": rng.normal(size=(ch, ch)).astype(np.float32), "bias": np.zeros(ch, np.float32)})
        add(a, "to_out.0", {"weight": rng.normal(size=(ch, ch)).astype(np.float32), "bias": np.zeros(ch, np.float32)})

    def encoder(p, out_ch):
        add(p, "conv_in", _synth_conv(rng, 3, chans[0]))
        ci = chans[0]
        for i, co in enumerate(chans):
            resnet(f"{p}down_blocks.{i}.resnets.0.", ci, co)
            if i < len(chans) - 1:
                add(f"{p}down_blocks.{i}.", "downsamplers.0.conv", _synth_conv(rng, co, co))
            ci = co
        mid(p + "mid_block.", chans[-1])
        add(p, "conv_norm_out", {"weight": np.ones(chans[-1], np.float32), "bias": np.zeros(chans[-1], np.float32)})
        add(p, "conv_out", _synth_conv(rng, chans[-1], out_ch))

    def decoder(p, in_ch, out_ch):
        rev = list(reversed(chans))
        add(p, "conv_in", _synth_conv(rng, in_ch, rev[0]))
        mid(p + "mid_block.", rev[0])
        ci = rev[0]
        for i, co in enumerate(rev):
            for j in range(2):  # layers_per_block + 1
                resnet(f"{p}up_blocks.{i}.resnets.{j}.", ci if j == 0 else co, co)
            if i < len(rev) - 1:
                add(f"{p}up_blocks.{i}.", "upsamplers.0.conv", _synth_conv(rng, co, co))
            ci = co
        add(p, "conv_norm_out", {"weight": np.ones(rev[-1], np.float32), "bias": np.zeros(rev[-1], np.float32)})
        add(p, "conv_out", _synth_conv(rng, rev[-1], out_ch))

    def cross(p, res_ch):
        for i, (res, ch) in enumerate(res_ch):
            q = f"{p}cross_att_blocks.{i}."
            sd[q + "att.in_proj_weight"] = rng.normal(size=(3 * ch, ch)).astype(np.float32)
            sd[q + "att.in_proj_bias"] = np.zeros(3 * ch, np.float32)
            add(q, "att.out_proj", {"weight": rng.normal(size=(ch, ch)).astype(np.float32), "bias": np.zeros(ch, np.float32)})
            add(q, "q_norm", {"weight": np.ones(ch, np.float32), "bias": np.zeros(ch, np.float32)})
            add(q, "kv_norm", {"weight": np.ones(ch, np.float32), "bias": np.zeros(ch, np.float32)})
            sd[q + "q_pos_emb"] = np.zeros((res * res, ch), np.float32)
            sd[q + "kv_pos_emb"] = np.zeros((res * res, ch), np.float32)

    encoder("encoder.", lat)
    encoder("cond_encoder.", lat)
    cross("cond_encoder.", [(16, 8), (16, 16)])  # block0 ch=8 (res 16), block1 ch=16
    decoder("decoder.", lat, 3)
    decoder("cond_decoder.", lat, 3)
    cross("cond_decoder.", [(16, 16)])
    add("", "quant_conv", _synth_conv(rng, lat, 5, k=1))
    add("", "post_quant_conv", _synth_conv(rng, 5, lat, k=1))
    sd["quant_linear.weight"] = rng.normal(size=(5, lat * 16)).astype(np.float32)
    sd["quant_linear.bias"] = np.zeros(5, np.float32)
    sd["post_quant_linear.weight"] = rng.normal(size=(lat * 16, 5)).astype(np.float32)
    sd["post_quant_linear.bias"] = np.zeros(lat * 16, np.float32)

    got = convert_compressive_vq(sd, n_blocks=len(chans), layers_per_block=1)
    ref_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(np.shape(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(got)[0]
    }
    missing = set(ref_flat) - set(got_flat)
    extra = set(got_flat) - set(ref_flat)
    assert not missing, f"missing params: {sorted(missing)[:8]}"
    assert not extra, f"extra params: {sorted(extra)[:8]}"
    for k in ref_flat:
        assert ref_flat[k] == got_flat[k], f"{k}: {ref_flat[k]} vs {got_flat[k]}"
    # converted tree actually runs
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, got), px)
    assert out.shape == (1, 3, 32, 32, 3)


def test_lpips_converter_shapes():
    from vla_rft_tpu.models.lpips import LPIPS
    from tools.convert_weights import convert_lpips

    rng = np.random.default_rng(0)
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256), (256, 256),
            (256, 512), (512, 512), (512, 512), (512, 512), (512, 512), (512, 512)]
    vgg_sd = {}
    for i, (cin, cout) in zip(conv_idx, plan):
        vgg_sd[f"features.{i}.weight"] = rng.normal(size=(cout, cin, 3, 3)).astype(np.float32)
        vgg_sd[f"features.{i}.bias"] = np.zeros(cout, np.float32)
    lin_sd = {
        f"lin{i}.model.1.weight": rng.normal(size=(1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate([64, 128, 256, 512, 512])
    }
    got = convert_lpips(vgg_sd, lin_sd)
    lp = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    ref = lp.init(jax.random.key(0), x, x)
    ref_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): tuple(np.shape(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(got)[0]
    }
    assert set(ref_flat) == set(got_flat)
    for k in ref_flat:
        assert ref_flat[k] == got_flat[k], k
    d = lp.apply(jax.tree_util.tree_map(jnp.asarray, got), x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_export_decoder_roundtrip():
    """export_hf_decoder is the exact inverse of convert_hf_decoder
    (model_merger.py analog: trained flax params -> HF state dict)."""
    from tools.export_weights import export_hf_decoder

    cfg = TransformerConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, qkv_bias=True, dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    dec = Decoder(cfg)
    params = dec.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    sd = export_hf_decoder(params, cfg)
    back = convert_hf_decoder(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(back)
    )
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_b[jax.tree_util.keystr(p)]), atol=0,
            err_msg=jax.tree_util.keystr(p),
        )
