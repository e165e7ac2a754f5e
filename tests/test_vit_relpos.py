"""vit_relpos trunk (models/vit_relpos.py) — torch oracle parity + mapping.

The oracle is a minimal torch VisionTransformerRelPos written from the
architecture timm's ``vision_transformer_relpos.py`` documents (rel-pos-MLP
'cr' log-coord bias, class-token zero padding, LayerScale pre-LN blocks,
qkv without bias, token pool), emitting timm-keyed state dicts so the test
validates ``core/checkpoint.py::_relpos_visual_*`` both directions. A nano
config (2 blocks, 4x4 grid) runs on CPU.
"""
import numpy as np
import pytest

import jax

from latteclip_tpu.core.checkpoint import params_to_pt_state_dict, pt_state_dict_to_params
from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models.swin import relative_position_index
from latteclip_tpu.models.vit_relpos import (
    RELPOS_TRUNKS,
    rel_log_coords,
    relpos_forward,
)

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

NANO = dict(width=16, layers=2, heads=2, patch_size=4, mlp_ratio=4.0,
            rel_pos_hidden=8, init_values=1e-6)


@pytest.fixture(autouse=True)
def _register_nano():
    RELPOS_TRUNKS["vit_relpos_test_nano"] = NANO
    yield
    RELPOS_TRUNKS.pop("vit_relpos_test_nano", None)


def _cfg():
    return config_from_dict(
        "tiny-relpos",
        {
            "embed_dim": 24,
            "vision_cfg": {"timm_model_name": "vit_relpos_test_nano",
                           "timm_pool": "", "timm_proj": "linear",
                           "image_size": 16},
            "text_cfg": {"context_length": 77, "vocab_size": 49408,
                         "width": 32, "heads": 4, "layers": 2},
        },
    )


class _TorchRelPosMlp(nn.Module):
    """timm RelPosMlp, mode='cr': sign-log coords -> 2->hidden->heads ReLU
    MLP -> gather by relative-position index -> cls-token zero pad."""

    def __init__(self, grid, heads, hidden):
        super().__init__()
        self.heads, self.grid = heads, grid
        self.fc1 = nn.Linear(2, hidden)
        self.fc2 = nn.Linear(hidden, heads)
        self.register_buffer(
            "coords", torch.from_numpy(rel_log_coords(grid)), persistent=False)
        self.register_buffer(
            "idx", torch.from_numpy(relative_position_index(grid)).view(-1),
            persistent=False)

    def get_bias(self):
        h = self.fc2(F.relu(self.fc1(self.coords)))          # [2g-1, 2g-1, H]
        flat = h.view(-1, self.heads)[self.idx]
        n = self.grid * self.grid
        bias = flat.view(n, n, self.heads).permute(2, 0, 1)  # [H, N, N]
        bias = F.pad(bias, [1, 0, 1, 0])                     # cls row+col of zeros
        return bias.unsqueeze(0)


class _TorchRelPosBlock(nn.Module):
    def __init__(self, dim, heads, grid, hidden, init_values):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)       # qkv_bias=False
        self.rel_pos = _TorchRelPosMlp(grid, heads, hidden)
        self.proj = nn.Linear(dim, dim)
        self.ls1 = nn.Parameter(torch.full((dim,), init_values))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)
        self.ls2 = nn.Parameter(torch.full((dim,), init_values))

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.heads
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        attn = attn + self.rel_pos.get_bias()
        out = F.softmax(attn, dim=-1) @ v
        out = self.proj(out.transpose(1, 2).reshape(B, N, C))
        x = x + self.ls1 * out
        return x + self.ls2 * self.fc2(F.gelu(self.fc1(self.norm2(x))))


class _TorchRelPosViT(nn.Module):
    def __init__(self, t, image_size, embed_dim):
        super().__init__()
        D, P = t["width"], t["patch_size"]
        grid = image_size // P
        self.patch_proj = nn.Conv2d(3, D, P, P)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
        self.blocks = nn.ModuleList([
            _TorchRelPosBlock(D, t["heads"], grid, t["rel_pos_hidden"],
                              t["init_values"])
            for _ in range(t["layers"])
        ])
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.head = nn.Linear(D, embed_dim, bias=False)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_proj(x).flatten(2).transpose(1, 2)    # [B, N, D]
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])                            # global_pool='token'

    def timm_state_dict(self):
        sd = {
            "visual.trunk.patch_embed.proj.weight": self.patch_proj.weight.detach().numpy(),
            "visual.trunk.patch_embed.proj.bias": self.patch_proj.bias.detach().numpy(),
            "visual.trunk.cls_token": self.cls_token.detach().numpy(),
            "visual.trunk.norm.weight": self.norm.weight.detach().numpy(),
            "visual.trunk.norm.bias": self.norm.bias.detach().numpy(),
            "visual.head.proj.weight": self.head.weight.detach().numpy(),
        }
        for i, blk in enumerate(self.blocks):
            pre = f"visual.trunk.blocks.{i}"
            sd[f"{pre}.norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[f"{pre}.norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[f"{pre}.attn.qkv.weight"] = blk.qkv.weight.detach().numpy()
            sd[f"{pre}.attn.rel_pos.mlp.fc1.weight"] = blk.rel_pos.fc1.weight.detach().numpy()
            sd[f"{pre}.attn.rel_pos.mlp.fc1.bias"] = blk.rel_pos.fc1.bias.detach().numpy()
            sd[f"{pre}.attn.rel_pos.mlp.fc2.weight"] = blk.rel_pos.fc2.weight.detach().numpy()
            sd[f"{pre}.attn.rel_pos.mlp.fc2.bias"] = blk.rel_pos.fc2.bias.detach().numpy()
            sd[f"{pre}.attn.proj.weight"] = blk.proj.weight.detach().numpy()
            sd[f"{pre}.attn.proj.bias"] = blk.proj.bias.detach().numpy()
            sd[f"{pre}.ls1.gamma"] = blk.ls1.detach().numpy()
            sd[f"{pre}.norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[f"{pre}.norm2.bias"] = blk.norm2.bias.detach().numpy()
            sd[f"{pre}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
            sd[f"{pre}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[f"{pre}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[f"{pre}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
            sd[f"{pre}.ls2.gamma"] = blk.ls2.detach().numpy()
        return sd


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


def test_relpos_forward_parity():
    cfg = _cfg()
    torch.manual_seed(0)
    oracle = _TorchRelPosViT(NANO, 16, cfg.embed_dim)
    for p in oracle.parameters():
        nn.init.normal_(p, std=0.05 if p.ndim >= 2 else 0.02)

    sd = oracle.timm_state_dict()
    visual = _load_visual(sd, cfg)

    rng = np.random.default_rng(5)
    imgs = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    ours = relpos_forward(visual, cfg.vision, np.asarray(imgs), dtype=np.float32)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def test_relpos_state_dict_roundtrip():
    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg()
    p = init_clip_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_pt_state_dict(p, cfg)
    assert "visual.trunk.blocks.1.attn.rel_pos.mlp.fc1.weight" in sd
    assert "visual.trunk.cls_token" in sd
    p2, _ = pt_state_dict_to_params(sd, cfg)
    fa = jax.tree_util.tree_flatten(p["visual"])[0]
    fb = jax.tree_util.tree_flatten(p2["visual"])[0]
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_relpos_layerscale_absent_defaults_to_identity():
    """A checkpoint from a trunk trained with init_values=None carries no
    ls{1,2}.gamma keys; the importer must default them to ones (identity),
    since the registry's 1e-6 is an init value, not a load value."""
    cfg = _cfg()
    torch.manual_seed(3)
    oracle = _TorchRelPosViT(NANO, 16, cfg.embed_dim)
    sd = {k: v for k, v in oracle.timm_state_dict().items()
          if not (k.endswith("ls1.gamma") or k.endswith("ls2.gamma"))}
    visual = _load_visual(sd, cfg)
    for b in visual["blocks"]:
        np.testing.assert_array_equal(np.asarray(b["ls_1"]), 1.0)
        np.testing.assert_array_equal(np.asarray(b["ls_2"]), 1.0)


def test_relpos_hidden_dim_is_shape_driven():
    """The rel-pos MLP hidden dim in RELPOS_TRUNKS is a transcription
    assumption; loads must take it from the checkpoint's own fc1 shape."""
    cfg = _cfg()
    torch.manual_seed(4)
    wide = dict(NANO, rel_pos_hidden=12)  # checkpoint wider than registry (8)
    oracle = _TorchRelPosViT(wide, 16, cfg.embed_dim)
    visual = _load_visual(oracle.timm_state_dict(), cfg)
    assert visual["blocks"][0]["mlp_fc1_w"].shape == (2, 12)
    imgs = np.random.default_rng(1).standard_normal((1, 16, 16, 3)).astype(np.float32)
    ours = relpos_forward(visual, cfg.vision, imgs, dtype=np.float32)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


def test_relpos_registry_resolves_and_ungated():
    from latteclip_tpu.core.config import (
        GATED_CONFIGS,
        RelPosVisionConfig,
        get_model_config,
    )

    assert "vit_relpos_medium_patch16_cls_224" not in GATED_CONFIGS
    cfg = get_model_config("vit_relpos_medium_patch16_cls_224")
    assert isinstance(cfg.vision, RelPosVisionConfig)
    assert cfg.vision.embed_width == 512 and cfg.embed_dim == 512
    t = RELPOS_TRUNKS[cfg.vision.trunk]
    assert (t["layers"], t["heads"], t["patch_size"]) == (12, 8, 16)


def test_relpos_remat_gradients_match():
    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg()
    params = init_clip_params(jax.random.PRNGKey(2), cfg)["visual"]
    imgs = np.random.default_rng(0).standard_normal((2, 16, 16, 3)).astype(np.float32)

    def loss(p, remat):
        out = relpos_forward(p, cfg.vision, imgs, dtype=np.float32, remat=remat)
        return jax.numpy.sum(out ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    fa = jax.tree_util.tree_flatten(g0)[0]
    fb = jax.tree_util.tree_flatten(g1)[0]
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
