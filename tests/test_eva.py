"""EVA01 (timm Eva giant) on the native ViT tower — oracle parity.

The reference reaches EVA01 through timm (``src/open_clip/timm_model.py``
with ``eva_giant_patch14_224``, pool='token', proj=None → the trunk's own
biased classifier head projects to embed_dim). timm is absent, so the oracle
is a minimal torch Eva written from the published architecture (timm
``eva.py`` with ``qkv_fused=True``: standard pre-norm ViT, fused qkv with
learnable q/v bias and an implicit-zero k bias, no ln_pre, final norm, cls
pooling, biased head Linear). The oracle emits timm-keyed state dicts, so the
test validates core/checkpoint.py::_eva_visual_* both directions.
"""
import dataclasses

import numpy as np
import pytest

from latteclip_tpu.core import config as config_mod
from latteclip_tpu.core.checkpoint import params_to_pt_state_dict, pt_state_dict_to_params
from latteclip_tpu.core.config import config_from_dict

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

# nano Eva for CPU CI: width 32, 2 layers, 4 heads, mlp_ratio 6144/1408
NANO = dict(width=32, layers=2, head_width=8, mlp_ratio=6144 / 1408, patch_size=8)


@pytest.fixture(autouse=True)
def _register_nano():
    config_mod.EVA_TRUNKS["eva_test_nano"] = NANO
    yield
    config_mod.EVA_TRUNKS.pop("eva_test_nano", None)


class _EvaBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv_w = nn.Parameter(torch.empty(3 * dim, dim))
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads

    def forward(self, x):
        B, L, D = x.shape
        h = self.norm1(x)
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias), self.v_bias])
        qkv = F.linear(h, self.qkv_w, bias).reshape(B, L, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = F.scaled_dot_product_attention(q, k, v)
        x = x + self.proj(attn.transpose(1, 2).reshape(B, L, D))
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class _TorchEva(nn.Module):
    def __init__(self, spec, embed_dim, image_size):
        super().__init__()
        D, P = spec["width"], spec["patch_size"]
        self.patch = nn.Conv2d(3, D, P, stride=P)
        n = (image_size // P) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, D))
        heads = D // spec["head_width"]
        self.blocks = nn.ModuleList(
            _EvaBlock(D, heads, spec["mlp_ratio"]) for _ in range(spec["layers"]))
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.head = nn.Linear(D, embed_dim)

    def forward(self, x):
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])

    def timm_state_dict(self):
        ren = {"patch.weight": "patch_embed.proj.weight",
               "patch.bias": "patch_embed.proj.bias"}
        out = {}
        for k, v in self.state_dict().items():
            if k.startswith("blocks."):
                k = k.replace(".qkv_w", ".attn.qkv.weight")
                k = k.replace(".q_bias", ".attn.q_bias").replace(".v_bias", ".attn.v_bias")
                k = k.replace(".proj.", ".attn.proj.")
                k = k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
            else:
                k = ren.get(k, k)
            out["visual.trunk." + k] = v.detach().numpy()
        return out


def _cfg():
    raw = {
        "embed_dim": 24,
        "vision_cfg": {"image_size": 32, "timm_model_name": "eva_test_nano",
                       "timm_pool": "token", "timm_proj": None},
        "text_cfg": {"context_length": 16, "vocab_size": 64,
                     "width": 24, "heads": 4, "layers": 2},
        "custom_text": True,
    }
    return dataclasses.replace(config_from_dict("eva_test", raw), compute_dtype="float32")


def test_eva_config_maps_to_native_vit():
    from latteclip_tpu.core.config import VisionConfig, get_model_config

    cfg = get_model_config("EVA01-g-14")
    assert isinstance(cfg.vision, VisionConfig)
    assert cfg.vision.timm_trunk == "eva_giant_patch14_224"
    assert cfg.vision.width == 1408 and cfg.vision.layers == 40
    assert cfg.vision.heads == 16
    assert int(cfg.vision.width * cfg.vision.mlp_ratio) == 6144
    assert cfg.vision.no_ln_pre and cfg.vision.pool_type == "tok"
    assert cfg.embed_dim == 1024
    plus = get_model_config("EVA01-g-14-plus")
    assert plus.text.layers == 24 and plus.text.width == 1024


def test_eva_feature_parity():
    import jax

    from latteclip_tpu.models.clip import encode_image
    from latteclip_tpu.models.text import init_text_params

    from test_convnext import _text_sd

    cfg = _cfg()
    torch.manual_seed(0)
    ref = _TorchEva(NANO, 24, 32).eval()
    gen = torch.Generator().manual_seed(6)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    sd = ref.timm_state_dict()
    sd["logit_scale"] = np.zeros(())
    text = init_text_params(jax.random.PRNGKey(0), cfg.text, cfg.embed_dim)
    params, _ = pt_state_dict_to_params({**sd, **_text_sd(text)}, cfg)

    rng = np.random.RandomState(13)
    images = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(encode_image(params, cfg, images))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_eva_state_dict_roundtrip():
    import jax

    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg()
    params = init_clip_params(jax.random.PRNGKey(4), cfg)
    sd = params_to_pt_state_dict(params, cfg)
    assert "visual.trunk.blocks.0.attn.q_bias" in sd
    assert "visual.trunk.head.bias" in sd
    back, _ = pt_state_dict_to_params(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
