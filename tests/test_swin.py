"""Swin trunk (models/swin.py) — torch oracle parity + mapping round-trip.

The oracle is a minimal torch Swin written from the published architecture
(arXiv 2103.14030: windowed MSA with relative position bias, shifted
windows with the region mask, patch merging), emitting timm-keyed state
dicts so the test validates ``core/checkpoint.py::_swin_visual_*`` both
directions. A nano config (2 stages, window 4) exercises shift and merge
on CPU.
"""
import numpy as np
import pytest

import jax

from latteclip_tpu.core.checkpoint import params_to_pt_state_dict, pt_state_dict_to_params
from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models import swin as swin_mod
from latteclip_tpu.models.swin import (
    SWIN_TRUNKS,
    relative_position_index,
    shift_attn_mask,
    swin_forward,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

NANO = dict(embed_dim=16, depths=(2, 2), heads=(2, 4), window=4,
            patch_size=4, mlp_ratio=4.0)


@pytest.fixture(autouse=True)
def _register_nano():
    SWIN_TRUNKS["swin_test_nano"] = NANO
    yield
    SWIN_TRUNKS.pop("swin_test_nano", None)


def _cfg():
    return config_from_dict(
        "tiny-swin",
        {
            "embed_dim": 24,
            "vision_cfg": {"timm_model_name": "swin_test_nano",
                           "timm_pool": "", "timm_proj": "linear",
                           "image_size": 32},
            "text_cfg": {"context_length": 77, "vocab_size": 49408,
                         "width": 32, "heads": 4, "layers": 2},
        },
    )


class _TorchWinAttn(nn.Module):
    def __init__(self, dim, heads, w):
        super().__init__()
        self.heads, self.w = heads, w
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.bias_table = nn.Parameter(torch.zeros((2 * w - 1) ** 2, heads))
        self.register_buffer(
            "idx", torch.from_numpy(relative_position_index(w)), persistent=False)

    def forward(self, x, mask):
        B_, N, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        attn = attn + self.bias_table[self.idx].permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + mask[None, :, None]
            attn = attn.view(B_, self.heads, N, N)
        out = F.softmax(attn, dim=-1) @ v
        return self.proj(out.transpose(1, 2).reshape(B_, N, C))


class _TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, w, shift, grid):
        super().__init__()
        self.w, self.shift, self.grid = w, shift, grid
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _TorchWinAttn(dim, heads, w)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)
        if shift:
            self.register_buffer(
                "mask", torch.from_numpy(shift_attn_mask(grid, w, shift)),
                persistent=False)
        else:
            self.mask = None

    def forward(self, x):  # x [B, H, W, C]
        B, H, W, C = x.shape
        w = self.w
        h = self.norm1(x)
        if self.shift:
            h = torch.roll(h, (-self.shift, -self.shift), dims=(1, 2))
        win = h.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
        win = win.reshape(-1, w * w, C)
        out = self.attn(win, self.mask)
        out = out.view(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        out = out.reshape(B, H, W, C)
        if self.shift:
            out = torch.roll(out, (self.shift, self.shift), dims=(1, 2))
        x = x + out
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class _TorchPatchMerge(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], dim=-1)
        return self.reduction(self.norm(x))


class _TorchSwin(nn.Module):
    def __init__(self, t, image_size, embed_dim):
        super().__init__()
        D0, P, w = t["embed_dim"], t["patch_size"], t["window"]
        self.P = P
        self.patch_proj = nn.Conv2d(3, D0, P, P)
        self.patch_norm = nn.LayerNorm(D0)
        grid = image_size // P
        self.stages = nn.ModuleList()
        self.merges = nn.ModuleList()
        dim = D0
        for si, depth in enumerate(t["depths"]):
            if si > 0:
                self.merges.append(_TorchPatchMerge(dim))
                dim *= 2
                grid //= 2
            blocks = nn.ModuleList([
                _TorchSwinBlock(dim, t["heads"][si], w,
                                (w // 2) if (bi % 2 == 1 and grid > w) else 0,
                                grid)
                for bi in range(depth)
            ])
            self.stages.append(blocks)
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, embed_dim, bias=False)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_proj(x)                       # [B, D, g, g]
        x = x.permute(0, 2, 3, 1)                    # [B, g, g, D]
        x = self.patch_norm(x)
        for si, blocks in enumerate(self.stages):
            if si > 0:
                x = self.merges[si - 1](x)
            for blk in blocks:
                x = blk(x)
        x = x.reshape(B, -1, x.shape[-1])
        x = self.norm(x)
        return self.head(x.mean(1))

    def timm_state_dict(self):
        sd = {
            "visual.trunk.patch_embed.proj.weight": self.patch_proj.weight.detach().numpy(),
            "visual.trunk.patch_embed.proj.bias": self.patch_proj.bias.detach().numpy(),
            "visual.trunk.patch_embed.norm.weight": self.patch_norm.weight.detach().numpy(),
            "visual.trunk.patch_embed.norm.bias": self.patch_norm.bias.detach().numpy(),
            "visual.trunk.norm.weight": self.norm.weight.detach().numpy(),
            "visual.trunk.norm.bias": self.norm.bias.detach().numpy(),
            "visual.head.proj.weight": self.head.weight.detach().numpy(),
        }
        for si, blocks in enumerate(self.stages):
            if si > 0:
                m = self.merges[si - 1]
                base = f"visual.trunk.layers.{si}.downsample"
                sd[f"{base}.norm.weight"] = m.norm.weight.detach().numpy()
                sd[f"{base}.norm.bias"] = m.norm.bias.detach().numpy()
                sd[f"{base}.reduction.weight"] = m.reduction.weight.detach().numpy()
            for bi, blk in enumerate(blocks):
                pre = f"visual.trunk.layers.{si}.blocks.{bi}"
                sd[f"{pre}.norm1.weight"] = blk.norm1.weight.detach().numpy()
                sd[f"{pre}.norm1.bias"] = blk.norm1.bias.detach().numpy()
                sd[f"{pre}.attn.qkv.weight"] = blk.attn.qkv.weight.detach().numpy()
                sd[f"{pre}.attn.qkv.bias"] = blk.attn.qkv.bias.detach().numpy()
                sd[f"{pre}.attn.relative_position_bias_table"] = blk.attn.bias_table.detach().numpy()
                sd[f"{pre}.attn.proj.weight"] = blk.attn.proj.weight.detach().numpy()
                sd[f"{pre}.attn.proj.bias"] = blk.attn.proj.bias.detach().numpy()
                sd[f"{pre}.norm2.weight"] = blk.norm2.weight.detach().numpy()
                sd[f"{pre}.norm2.bias"] = blk.norm2.bias.detach().numpy()
                sd[f"{pre}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
                sd[f"{pre}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
                sd[f"{pre}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
                sd[f"{pre}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        return sd


def test_swin_forward_parity():
    cfg = _cfg()
    torch.manual_seed(0)
    oracle = _TorchSwin(NANO, 32, cfg.embed_dim)
    for p in oracle.parameters():
        nn.init.normal_(p, std=0.05 if p.ndim >= 2 else 0.02)

    sd = oracle.timm_state_dict()
    visual = _load_visual(sd, cfg)

    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = swin_forward(visual, cfg.vision, np.asarray(imgs), dtype=np.float32)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def _load_visual(vis_sd, cfg):
    W = 32
    full = dict(vis_sd)
    full.update({
        "logit_scale": np.zeros(()),
        "token_embedding.weight": np.zeros((49408, W), np.float32),
        "positional_embedding": np.zeros((77, W), np.float32),
        "ln_final.weight": np.ones(W, np.float32),
        "ln_final.bias": np.zeros(W, np.float32),
        "text_projection": np.zeros((W, cfg.embed_dim), np.float32),
    })
    for i in range(2):
        full.update({
            f"transformer.resblocks.{i}.ln_1.weight": np.ones(W, np.float32),
            f"transformer.resblocks.{i}.ln_1.bias": np.zeros(W, np.float32),
            f"transformer.resblocks.{i}.attn.in_proj_weight": np.zeros((3 * W, W), np.float32),
            f"transformer.resblocks.{i}.attn.in_proj_bias": np.zeros(3 * W, np.float32),
            f"transformer.resblocks.{i}.attn.out_proj.weight": np.zeros((W, W), np.float32),
            f"transformer.resblocks.{i}.attn.out_proj.bias": np.zeros(W, np.float32),
            f"transformer.resblocks.{i}.ln_2.weight": np.ones(W, np.float32),
            f"transformer.resblocks.{i}.ln_2.bias": np.zeros(W, np.float32),
            f"transformer.resblocks.{i}.mlp.c_fc.weight": np.zeros((4 * W, W), np.float32),
            f"transformer.resblocks.{i}.mlp.c_fc.bias": np.zeros(4 * W, np.float32),
            f"transformer.resblocks.{i}.mlp.c_proj.weight": np.zeros((W, 4 * W), np.float32),
            f"transformer.resblocks.{i}.mlp.c_proj.bias": np.zeros(W, np.float32),
        })
    return pt_state_dict_to_params(full, cfg)[0]["visual"]


def test_swin_msra_downsample_layout_accepted():
    """The original MSRA layout keys downsample at END of stage s-1; the
    importer must map it to the same stage-input position."""
    cfg = _cfg()
    torch.manual_seed(1)
    oracle = _TorchSwin(NANO, 32, cfg.embed_dim)
    sd = oracle.timm_state_dict()
    moved = {}
    for k, v in sd.items():
        if ".layers.1.downsample." in k:
            moved[k.replace(".layers.1.", ".layers.0.")] = v
        else:
            moved[k] = v
    va = _load_visual(sd, cfg)
    vb = _load_visual(moved, cfg)
    fa = jax.tree_util.tree_flatten(va)[0]
    fb = jax.tree_util.tree_flatten(vb)[0]
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swin_state_dict_roundtrip():
    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg()
    p = init_clip_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_pt_state_dict(p, cfg)
    assert "visual.trunk.layers.1.downsample.reduction.weight" in sd
    p2, _ = pt_state_dict_to_params(sd, cfg)
    fa = jax.tree_util.tree_flatten(p["visual"])[0]
    fb = jax.tree_util.tree_flatten(p2["visual"])[0]
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_swin_registry_and_guard():
    from latteclip_tpu.core.config import SwinVisionConfig, get_model_config

    cfg = get_model_config("swin_base_patch4_window7_224")
    assert isinstance(cfg.vision, SwinVisionConfig)
    assert cfg.vision.embed_width == 1024 and cfg.embed_dim == 640
    # indivisible final grid must raise, not silently mis-window
    bad = config_from_dict("bad-swin", {
        "embed_dim": 24,
        "vision_cfg": {"timm_model_name": "swin_test_nano",
                       "timm_pool": "", "timm_proj": "linear",
                       "image_size": 40},
        "text_cfg": {"context_length": 77, "vocab_size": 49408,
                     "width": 32, "heads": 4, "layers": 2},
    })
    from latteclip_tpu.models.swin import init_swin_params

    params = init_swin_params(jax.random.PRNGKey(0), bad.vision, 24)
    with pytest.raises(ValueError, match="not divisible"):
        swin_forward(params, bad.vision, np.zeros((1, 40, 40, 3), np.float32))


def test_swin_remat_gradients_match():
    """remat=True (jax.checkpoint over each block) must not change values
    or gradients."""
    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg()
    params = init_clip_params(jax.random.PRNGKey(2), cfg)["visual"]
    imgs = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)

    def loss(p, remat):
        out = swin_forward(p, cfg.vision, imgs, dtype=np.float32, remat=remat)
        return jax.numpy.sum(out ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    fa = jax.tree_util.tree_flatten(g0)[0]
    fb = jax.tree_util.tree_flatten(g1)[0]
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
