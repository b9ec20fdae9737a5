"""Numerical goldens for the vision-side converters (VERDICT r2 item 4).

Three families, same rigor as tests/test_torch_golden.py:

* SigLIP / DINOv2 towers — torch stand-in replicating timm's
  VisionTransformer semantics (fused qkv attention, LayerScale, exact GELU,
  no_embed_class handling for dinov2-reg, and the reference's
  get_intermediate_layers(n={depth-2}) feature tap,
  modeling_prismatic.py:118-142) vs our flax ViT through convert_timm_vit.
* CompressiveVQModelFSQ — the reference's OWN ctx_tokenizer code
  (ivideogpt/ctx_tokenizer/compressive_vq_model.py:250-346, vae.py,
  conditional_vae.py) loaded by file path with only the leaf diffusers
  blocks stubbed in torch, vs our flax tokenizer through
  convert_compressive_vq.
* LPIPS — the reference's OWN lpips.py (ivideogpt/lpips.py:54-175) with
  torchvision.models.vgg16 stubbed, vs our flax LPIPS through convert_lpips.

All comparisons run f32/f32 with seeded random weights loaded into BOTH
implementations, so a transposed/permuted weight or a wrong tap produces
O(1) errors.
"""
import importlib.machinery
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

IVG = "/root/reference/train/verl/ivideogpt"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _mkmod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def _randomize(mod: nn.Module, seed: int, scale=0.05):
    """Load seeded random values into every trainable parameter (buffers —
    e.g. LPIPS ScalingLayer shift/scale — keep their true values); return
    the state dict."""
    g = torch.Generator().manual_seed(seed)
    param_names = {k for k, _ in mod.named_parameters()}
    sd = {
        k: (torch.randn(v.shape, generator=g) * scale if k in param_names else v.clone())
        for k, v in mod.state_dict().items()
    }
    mod.load_state_dict(sd)
    return {k: v.clone() for k, v in sd.items()}


# =====================================================================
# timm VisionTransformer stand-in (public timm layout; semantics per
# timm/models/vision_transformer.py: Attention/Block/LayerScale/_pos_embed)
# =====================================================================


class _TimmAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TimmLayerScale(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class _TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()  # exact gelu: act override is None (configuration_prismatic.py:44)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, layerscale):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, heads)
        self.ls1 = _TimmLayerScale(dim) if layerscale else nn.Identity()
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TimmMlp(dim, mlp_dim)
        self.ls2 = _TimmLayerScale(dim) if layerscale else nn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class _TimmPatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        x = self.proj(x)  # (B, D, H', W')
        return x.flatten(2).transpose(1, 2)  # (B, N, D)


class _TimmViT(nn.Module):
    """Enough of timm.models.VisionTransformer to replicate the reference's
    feature tap: blocks 0..depth-2, prefix tokens stripped, no final norm
    (get_intermediate_layers with norm=False, return_prefix_tokens=False)."""

    def __init__(self, img, patch, dim, depth, heads, mlp_dim,
                 class_token=False, reg_tokens=0, no_embed_class=False,
                 layerscale=False):
        super().__init__()
        n_patches = (img // patch) ** 2
        self.no_embed_class = no_embed_class
        self.patch_embed = _TimmPatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim)) if class_token else None
        self.reg_token = nn.Parameter(torch.zeros(1, reg_tokens, dim)) if reg_tokens else None
        pos_len = n_patches if (no_embed_class or not class_token) else n_patches + 1
        self.pos_embed = nn.Parameter(torch.randn(1, pos_len, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [_TimmBlock(dim, heads, mlp_dim, layerscale) for _ in range(depth)]
        )
        self.num_prefix_tokens = (1 if class_token else 0) + reg_tokens

    def forward_tap(self, x):
        x = self.patch_embed(x)
        to_cat = []
        if self.cls_token is not None:
            to_cat.append(self.cls_token.expand(x.shape[0], -1, -1))
        if self.reg_token is not None:
            to_cat.append(self.reg_token.expand(x.shape[0], -1, -1))
        if self.no_embed_class:
            x = x + self.pos_embed
            if to_cat:
                x = torch.cat(to_cat + [x], dim=1)
        else:
            if to_cat:
                x = torch.cat(to_cat + [x], dim=1)
            x = x + self.pos_embed
        for blk in self.blocks[:-1]:  # 0..depth-2: the second-to-last tap
            x = blk(x)
        return x[:, self.num_prefix_tokens:]


def _vit_state_dict_timm_names(model: _TimmViT):
    """state_dict with timm key names (ls gamma etc. already match)."""
    return {k: v.detach().clone() for k, v in model.state_dict().items()}


def _run_vit_golden(cfg, torch_kwargs, seed):
    from tools.convert_weights import convert_timm_vit
    from vla_rft_tpu.models.vit import ViT

    torch.manual_seed(seed)
    tm = _TimmViT(**torch_kwargs).float().eval()
    _randomize(tm, seed + 1, scale=0.05)
    sd = _vit_state_dict_timm_names(tm)

    rng = np.random.default_rng(seed)
    img = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.forward_tap(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()

    params = convert_timm_vit(sd, cfg)
    got = np.asarray(
        ViT(cfg).apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.asarray(img))
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_siglip_tower_golden():
    """SigLIP-style tower (no cls/reg, pos over patches) converts faithfully.
    Small depth, real per-block structure (vit_so400m so400m semantics)."""
    from vla_rft_tpu.models.vit import ViTConfig

    cfg = ViTConfig.siglip_so400m(
        image_size=56, patch_size=14, hidden_size=64, depth=4, num_heads=4,
        mlp_dim=112, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    _run_vit_golden(
        cfg,
        dict(img=56, patch=14, dim=64, depth=4, heads=4, mlp_dim=112,
             class_token=False, reg_tokens=0, no_embed_class=False, layerscale=False),
        seed=0,
    )


def test_dinov2_tower_golden():
    """DINOv2-reg4-style tower: cls + 4 registers with NO pos embed on the
    prefix tokens (timm no_embed_class=True) + LayerScale. Catches the
    pos-embed-prefix layout class of bugs."""
    from vla_rft_tpu.models.vit import ViTConfig

    cfg = ViTConfig.dinov2_large_reg4(
        image_size=56, patch_size=14, hidden_size=64, depth=4, num_heads=4,
        mlp_dim=112, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    assert not cfg.pos_embed_prefix  # timm no_embed_class=True
    _run_vit_golden(
        cfg,
        dict(img=56, patch=14, dim=64, depth=4, heads=4, mlp_dim=112,
             class_token=True, reg_tokens=4, no_embed_class=True, layerscale=True),
        seed=3,
    )


def test_vision_backbone_order_matches_reference():
    """featurizer must be the DINOv2 tower and fused_featurizer the SigLIP
    tower (modeling_prismatic.py:103-113 + configuration_prismatic.py:36),
    with features concatenated [dino, siglip] (forward :199-206)."""
    from vla_rft_tpu.models.prismatic import OpenVLAConfig, PrismaticVisionBackbone

    cfg = OpenVLAConfig.tiny_test()
    bb = PrismaticVisionBackbone(cfg)
    params = bb.init(jax.random.key(0), jnp.zeros((1, 28, 28, 6)))["params"]
    # dinov2 featurizer has cls/reg tokens; siglip does not
    assert "cls_token" in params["featurizer"]
    assert "reg_tokens" in params["featurizer"]
    assert "cls_token" not in params["fused_featurizer"]
    # dino pos embed covers patches only (no_embed_class)
    assert params["featurizer"]["pos_embed"].shape[1] == cfg.dino.num_patches


# =====================================================================
# diffusers stubs for the ctx_tokenizer reference code
# =====================================================================


class _ResnetBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels=None, groups=32, eps=1e-6, **kw):
        super().__init__()
        out_channels = out_channels or in_channels
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=eps)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = nn.SiLU()
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1) if in_channels != out_channels else None
        )

    def forward(self, x, temb=None):
        h = self.conv1(self.nonlinearity(self.norm1(x)))
        h = self.conv2(self.nonlinearity(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _Downsample2D(nn.Module):
    def __init__(self, channels, out_channels=None):
        super().__init__()
        self.conv = nn.Conv2d(channels, out_channels or channels, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _Upsample2D(nn.Module):
    def __init__(self, channels, out_channels=None):
        super().__init__()
        self.conv = nn.Conv2d(channels, out_channels or channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _VaeAttention(nn.Module):
    """diffusers Attention as instantiated by UNetMidBlock2D for VAEs:
    1 head spanning all channels (attention_head_dim=C), GN(32, eps=1e-6),
    residual connection, to_out.0 linear."""

    def __init__(self, channels, groups, eps=1e-6):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=eps)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])
        self.scale = channels**-0.5

    def forward(self, x, temb=None):
        B, C, H, W = x.shape
        h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)  # (B, HW, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.scale, dim=-1)
        o = self.to_out[0](attn @ v)
        return x + o.transpose(1, 2).reshape(B, C, H, W)


class _DownEncoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers, add_downsample, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_ResnetBlock2D(in_channels if i == 0 else out_channels, out_channels, groups)
             for i in range(num_layers)]
        )
        self.downsamplers = (
            nn.ModuleList([_Downsample2D(out_channels)]) if add_downsample else None
        )

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                x = d(x)
        return x


class _UpDecoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, num_layers, add_upsample, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_ResnetBlock2D(in_channels if i == 0 else out_channels, out_channels, groups)
             for i in range(num_layers)]
        )
        self.upsamplers = nn.ModuleList([_Upsample2D(out_channels)]) if add_upsample else None

    def forward(self, x, temb=None):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            for u in self.upsamplers:
                x = u(x)
        return x


class _UNetMidBlock2D(nn.Module):
    def __init__(self, in_channels, resnet_groups, add_attention=True, **kw):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_ResnetBlock2D(in_channels, in_channels, resnet_groups),
             _ResnetBlock2D(in_channels, in_channels, resnet_groups)]
        )
        self.attentions = nn.ModuleList(
            [_VaeAttention(in_channels, resnet_groups)] if add_attention else []
        )

    def forward(self, x, temb=None):
        x = self.resnets[0](x)
        if self.attentions:
            x = self.attentions[0](x)
        return self.resnets[1](x)


def _stub_diffusers():
    if "diffusers" in sys.modules and not hasattr(sys.modules["diffusers"], "__vla_rft_stub__"):
        return  # real diffusers present

    def get_down_block(block_type, num_layers, in_channels, out_channels,
                       add_downsample, resnet_groups=32, **kw):
        assert block_type == "DownEncoderBlock2D"
        return _DownEncoderBlock2D(in_channels, out_channels, num_layers, add_downsample, resnet_groups)

    def get_up_block(block_type, num_layers, in_channels, out_channels,
                     add_upsample, resnet_groups=32, **kw):
        assert block_type == "UpDecoderBlock2D"
        return _UpDecoderBlock2D(in_channels, out_channels, num_layers, add_upsample, resnet_groups)

    def mid_block(in_channels, resnet_groups=32, add_attention=True, **kw):
        return _UNetMidBlock2D(in_channels, resnet_groups, add_attention)

    class BaseOutput:
        def __init__(self, *a, **k):
            pass

    def register_to_config(fn):
        return fn

    def apply_forward_hook(fn):
        return fn

    def get_activation(name):
        assert name == "silu"
        return nn.SiLU()

    def is_torch_version(op, ver):
        return True

    root = _mkmod("diffusers")
    root.__vla_rft_stub__ = True
    _mkmod("diffusers.utils", BaseOutput=BaseOutput, is_torch_version=is_torch_version)
    _mkmod("diffusers.utils.torch_utils", randn_tensor=lambda *a, **k: None)
    _mkmod("diffusers.utils.accelerate_utils", apply_forward_hook=apply_forward_hook)
    _mkmod("diffusers.configuration_utils", register_to_config=register_to_config, ConfigMixin=object)
    _mkmod("diffusers.models")
    _mkmod("diffusers.models.modeling_utils", ModelMixin=nn.Module)
    _mkmod("diffusers.models.activations", get_activation=get_activation)
    _mkmod("diffusers.models.attention_processor", SpatialNorm=nn.Identity)
    _mkmod("diffusers.models.autoencoders")
    _mkmod("diffusers.models.autoencoders.vae", VectorQuantizer=object)
    _mkmod("diffusers.models.unets")
    _mkmod(
        "diffusers.models.unets.unet_2d_blocks",
        AutoencoderTinyBlock=object,
        UNetMidBlock2D=mid_block,
        get_down_block=get_down_block,
        get_up_block=get_up_block,
    )


@pytest.fixture(scope="module")
def ref_ctx_tokenizer():
    _stub_diffusers()
    for pkg in ("ivideogpt", "ivideogpt.tokenizer", "ivideogpt.ctx_tokenizer"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    _load("ivideogpt.tokenizer.finite_scalar_quantize", f"{IVG}/tokenizer/finite_scalar_quantize.py")
    _load("ivideogpt.ctx_tokenizer.vae", f"{IVG}/ctx_tokenizer/vae.py")
    _load("ivideogpt.ctx_tokenizer.conditional_vae", f"{IVG}/ctx_tokenizer/conditional_vae.py")
    return _load("ivideogpt.ctx_tokenizer.compressive_vq_model", f"{IVG}/ctx_tokenizer/compressive_vq_model.py")


def test_compressive_vq_golden(ref_ctx_tokenizer):
    """tokenize + detokenize match the reference's own torch code end-to-end
    (compressive_vq_model.py:250-346) with identical random weights.

    Full production topology (4 blocks, 3 downsamples 256->32, cross-attn at
    res<=32, patchify 4 -> 8x8 dyn tokens), thin channels for CPU speed."""
    from tools.convert_weights import convert_compressive_vq
    from vla_rft_tpu.models.tokenizers import CompressiveVQModelFSQ

    chans = (32, 64, 64, 64)
    torch.manual_seed(0)
    ref = ref_ctx_tokenizer.CompressiveVQModelFSQ(
        down_block_types=("DownEncoderBlock2D",) * len(chans),
        up_block_types=("UpDecoderBlock2D",) * len(chans),
        block_out_channels=list(chans), layers_per_block=2, latent_channels=4,
        norm_num_groups=32, resolution=256, patch_size=4, max_att_resolution=32,
    ).float().eval()
    sd = _randomize(ref, 7, scale=0.05)

    ours = CompressiveVQModelFSQ(
        block_out_channels=chans, layers_per_block=2, latent_channels=4,
        norm_num_groups=32, resolution=256, patch_size=4, max_att_resolution=32,
        dtype=jnp.float32,
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_compressive_vq(sd, n_blocks=4, layers_per_block=2)
    )

    rng = np.random.default_rng(0)
    B, T = 1, 3
    vid = rng.uniform(0.0, 1.0, (B, T, 256, 256, 3)).astype(np.float32)

    with torch.no_grad():
        idx_c_ref, idx_d_ref = ref.tokenize(
            torch.from_numpy(vid).permute(0, 1, 4, 2, 3), context_length=1
        )
    idx_c, idx_d = ours.apply(params, jnp.asarray(vid), method=ours.tokenize)
    idx_c, idx_d = np.asarray(idx_c), np.asarray(idx_d)
    assert idx_c.shape == tuple(idx_c_ref.shape) and idx_d.shape == tuple(idx_d_ref.shape)
    # FSQ rounding can flip on f32 reduce-order noise exactly at bin edges;
    # demand near-total agreement (a layout bug scrambles ~all indices)
    agree_c = (idx_c == idx_c_ref.numpy()).mean()
    agree_d = (idx_d == idx_d_ref.numpy()).mean()
    assert agree_c > 0.995, f"ctx token agreement {agree_c}"
    assert agree_d > 0.995, f"dyn token agreement {agree_d}"

    # detokenize: identical tokens in -> pixels out must match numerically
    with torch.no_grad():
        pix_ref = ref.detokenize(
            torch.from_numpy(idx_c), torch.from_numpy(idx_d), context_length=1
        ).permute(0, 1, 3, 4, 2).numpy()
    pix = np.asarray(
        ours.apply(params, jnp.asarray(idx_c), jnp.asarray(idx_d), method=ours.detokenize)
    )
    assert pix.shape == pix_ref.shape
    np.testing.assert_allclose(pix, pix_ref, rtol=1e-3, atol=5e-4)


# =====================================================================
# LPIPS golden vs the reference's own lpips.py (torchvision stubbed)
# =====================================================================


class _TorchVGG16(nn.Module):
    """torchvision.models.vgg16().features layout: conv indices
    (0,2,5,7,10,12,14,17,19,21,24,26,28), maxpool at (4,9,16,23,30)."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, c_in = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(c_in, v, 3, padding=1), nn.ReLU(inplace=False)]
                c_in = v
        self.features = nn.Sequential(*layers)


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return

    def vgg16(pretrained=False, **kw):
        return _TorchVGG16()

    tv = _mkmod("torchvision")
    _mkmod("torchvision.models", vgg16=vgg16)
    tv.models = sys.modules["torchvision.models"]


def _stub_requests_tqdm():
    for name in ("requests", "tqdm"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                m = _mkmod(name)
                if name == "tqdm":
                    m.tqdm = lambda *a, **k: None


def test_lpips_golden():
    """Our flax LPIPS matches the reference lpips.py LPIPS.forward with the
    same (random) VGG + lin weights, at production 256x256 input."""
    _stub_torchvision()
    _stub_requests_tqdm()
    ref_mod = _load("ref_lpips", f"{IVG}/lpips.py")
    ref_mod.LPIPS.load_from_pretrained = lambda self, *a, **k: None  # no download

    from tools.convert_weights import convert_lpips
    from vla_rft_tpu.models.lpips import LPIPS as OurLPIPS

    torch.manual_seed(0)
    ref = ref_mod.LPIPS(use_dropout=True).float().eval()
    _randomize(ref, 11, scale=0.05)

    # rebuild the torchvision-style vgg_sd + lpips-ckpt-style lin_sd the
    # converter expects from the reference module's slice naming
    ref_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    slice_of = {}
    for s, (lo, hi) in enumerate([(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)], start=1):
        for i in range(lo, hi):
            slice_of[i] = s
    vgg_sd = {}
    for i in (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28):
        s = slice_of[i]
        vgg_sd[f"features.{i}.weight"] = ref_sd[f"net.slice{s}.{i}.weight"]
        vgg_sd[f"features.{i}.bias"] = ref_sd[f"net.slice{s}.{i}.bias"]
    lin_sd = {f"lin{i}.model.1.weight": ref_sd[f"lin{i}.model.1.weight"] for i in range(5)}

    params = jax.tree_util.tree_map(jnp.asarray, convert_lpips(vgg_sd, lin_sd))

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(a).permute(0, 3, 1, 2), torch.from_numpy(b).permute(0, 3, 1, 2)
        ).reshape(-1).numpy()
    got = np.asarray(OurLPIPS(dtype=jnp.float32).apply(params, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
