"""EVA02 trunk (models/eva02.py) — oracle parity + rope properties.

The reference reaches EVA02 through timm (absent here), so like EVA01
(tests/test_eva.py) the oracle is a minimal torch implementation written
from the published TrV architecture (EVA-02 arXiv 2303.11331; EVA-CLIP
2303.15389): rope on q/k, SwiGLU with sub-LN, optional inner attention
norm, optional post-norm blocks. The torch oracle emits timm-keyed state
dicts, validating ``core/checkpoint.py::_eva02_visual_*`` both directions.

The rope layout itself (which cannot be cross-checked against timm in this
environment) is additionally pinned by MATHEMATICAL properties that any
correct rope must satisfy: norm preservation, identity on the class token,
and dot products that depend only on RELATIVE 2-D position.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core import config as config_mod
from latteclip_tpu.core.checkpoint import params_to_pt_state_dict, pt_state_dict_to_params
from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models.eva02 import apply_rope_packed, rope_sin_cos

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

# nano trunks for CPU CI
NANO_TRV = dict(patch_size=8, width=32, layers=2, head_width=8,
                swiglu_hidden=24, ref_feat_shape=4)
NANO_POST = dict(patch_size=8, width=32, layers=2, head_width=8,
                 swiglu_hidden=64, swiglu=False, use_rope=False,
                 inner_attn_norm=False, post_norm=True)
NANO_SPLIT = dict(NANO_TRV, qkv_fused=False)


@pytest.fixture(autouse=True)
def _register_nano():
    config_mod.EVA02_TRUNKS["eva02_test_trv"] = NANO_TRV
    config_mod.EVA02_TRUNKS["eva02_test_post"] = NANO_POST
    config_mod.EVA02_TRUNKS["eva02_test_split"] = NANO_SPLIT
    yield
    for k in ("eva02_test_trv", "eva02_test_post", "eva02_test_split"):
        config_mod.EVA02_TRUNKS.pop(k, None)


def _cfg(trunk):
    return config_from_dict(
        f"tiny-{trunk}",
        {
            "embed_dim": 16,
            "vision_cfg": {"image_size": 32, "timm_model_name": trunk,
                           "timm_pool": "token", "timm_proj": None},
            "text_cfg": {"context_length": 77, "vocab_size": 49408,
                         "width": 32, "heads": 4, "layers": 2},
            "custom_text": True,
        },
    )


# ---------------------------------------------------------------------------
# rope properties
# ---------------------------------------------------------------------------

def test_rope_preserves_norm_and_cls_identity():
    sin, cos = rope_sin_cos(4, 4, 16, ref_shape=4)
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((2, 17, 3 * 4 * 16)), jnp.float32)
    out = apply_rope_packed(qkv, 4, sin, cos)
    # rotation preserves per-head q/k norms
    def norms(x):
        return np.linalg.norm(np.asarray(x).reshape(2, 17, 3, 4, 16), axis=-1)
    np.testing.assert_allclose(norms(out)[:, :, :2], norms(qkv)[:, :, :2], rtol=1e-5)
    # class token (row 0) untouched, v stream untouched
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(qkv[:, 0]))
    hd = 4 * 16
    np.testing.assert_array_equal(np.asarray(out[..., 2 * hd:]),
                                  np.asarray(qkv[..., 2 * hd:]))


def test_rope_dot_depends_only_on_relative_position():
    """q at (y1,x1) · k at (y2,x2) must equal q at (y1+dy,x1+dx) · k at
    (y2+dy,x2+dx) after rotation — the defining property of rope."""
    g, D = 6, 16
    sin, cos = rope_sin_cos(g, g, D, with_cls=False)
    rng = np.random.default_rng(1)
    q = rng.standard_normal(D).astype(np.float32)
    k = rng.standard_normal(D).astype(np.float32)

    def rot(v, pos):
        s, c = np.asarray(sin)[pos], np.asarray(cos)[pos]
        half = D // 2
        r = np.concatenate([-v[half:], v[:half]])
        return v * c + r * s

    def dot_at(y1, x1, y2, x2):
        return float(rot(q, y1 * g + x1) @ rot(k, y2 * g + x2))

    base = dot_at(1, 1, 2, 3)
    np.testing.assert_allclose(dot_at(2, 2, 3, 4), base, rtol=1e-5)
    np.testing.assert_allclose(dot_at(3, 0, 4, 2), base, rtol=1e-5)
    # and it must CHANGE when relative position changes
    assert abs(dot_at(1, 1, 3, 3) - base) > 1e-4


def _timm_rope_apply(x: np.ndarray, sin_h: np.ndarray, cos_h: np.ndarray) -> np.ndarray:
    """Independent implementation of timm's ``apply_rot_embed_cat`` semantics
    (timm ``layers/pos_embed_sincos.py``): INTERLEAVED channel pairing
    ``rot(x) = stack([-x[..., 1::2], x[..., ::2]])`` with the axial sin/cos
    vectors ``repeat_interleave(2)``-expanded. ``sin_h``/``cos_h``: [L, D/2]
    sin/cos of the angle vector (passed precomputed so both conventions use
    bit-identical tables — the identity under test is the channel
    conjugation, not float32 table precision)."""
    sin = np.repeat(sin_h, 2, axis=-1)
    cos = np.repeat(cos_h, 2, axis=-1)
    rot = np.stack([-x[..., 1::2], x[..., ::2]], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


def test_rope_import_perm_matches_timm_interleaved_convention():
    """The importer's q/k channel permutation (checkpoint.py::
    _eva02_rope_qk_perm via eva02.rope_perm_interleaved_to_half) makes our
    rotate-half rope reproduce timm's interleaved-convention computation
    EXACTLY: attention scores from (raw weights + timm convention) equal
    (permuted weights + our convention). This converts the round-3 'rope
    channel layout cannot be cross-checked' assumption into a pinned
    conversion of timm's published apply_rot_embed_cat semantics."""
    from latteclip_tpu.models.eva02 import rope_perm_interleaved_to_half

    g, D = 4, 16
    L = g * g
    sin, cos = rope_sin_cos(g, g, D, with_cls=False)
    sin, cos = np.asarray(sin), np.asarray(cos)
    # our tables carry the duplicated rotate-half layout; the underlying
    # angle vector is the first half (asin of sin is unsafe — rebuild it)
    bands = D // 4
    freqs = 10000.0 ** (-np.arange(bands) / bands)
    ys, xs = np.arange(g, dtype=np.float64), np.arange(g, dtype=np.float64)
    a = np.concatenate([
        np.broadcast_to((ys[:, None] * freqs)[:, None, :], (g, g, bands)),
        np.broadcast_to((xs[:, None] * freqs)[None, :, :], (g, g, bands)),
    ], axis=-1).reshape(L, D // 2)
    np.testing.assert_allclose(np.sin(a), sin[:, :D // 2], atol=1e-6)
    # both sides take the SAME (float32) tables: ours duplicated, timm's the
    # [L, D/2] halves — what's under test is the channel conjugation
    sin_h, cos_h = sin[:, :D // 2], cos[:, :D // 2]

    rng = np.random.default_rng(3)
    q = rng.standard_normal((L, D)).astype(np.float64)
    k = rng.standard_normal((L, D)).astype(np.float64)
    perm = rope_perm_interleaved_to_half(D)

    def our_rope(x):
        half = D // 2
        rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        return x * cos + rot * sin

    # vector identity: our convention on permuted channels IS timm's
    # convention, channel-permuted
    np.testing.assert_allclose(
        our_rope(q[:, perm]), _timm_rope_apply(q, sin_h, cos_h)[:, perm],
        atol=1e-12)
    # score identity: q.k^T invariant under the simultaneous permutation
    scores_timm = _timm_rope_apply(q, sin_h, cos_h) @ _timm_rope_apply(k, sin_h, cos_h).T
    scores_ours = our_rope(q[:, perm]) @ our_rope(k[:, perm]).T
    np.testing.assert_allclose(scores_ours, scores_timm, atol=1e-10)


def test_rope_import_perm_importer_level():
    """_eva02_rope_qk_perm at the in_proj level: scores computed with raw
    timm weights + timm convention == imported weights + our convention,
    for a multi-head projection; and inverse=True round-trips exactly."""
    from latteclip_tpu.core.checkpoint import _eva02_rope_qk_perm
    from latteclip_tpu.core.config import Eva02VisionConfig

    W, Dh = 32, 8  # 4 heads
    cfg = Eva02VisionConfig(width=W, head_width=Dh, image_size=16, patch_size=4)
    g = 4
    rng = np.random.default_rng(5)
    ipw = rng.standard_normal((W, 3 * W)).astype(np.float64)
    ipb = rng.standard_normal(3 * W).astype(np.float64)
    x = rng.standard_normal((g * g, W)).astype(np.float64)

    pw, pb = _eva02_rope_qk_perm(ipw, ipb, cfg)
    rw, rb = _eva02_rope_qk_perm(pw, pb, cfg, inverse=True)
    np.testing.assert_array_equal(rw, ipw)
    np.testing.assert_array_equal(rb, ipb)

    sin, cos = rope_sin_cos(g, g, Dh, with_cls=False)
    sin, cos = np.asarray(sin, np.float64), np.asarray(cos, np.float64)
    sin_h, cos_h = sin[:, :Dh // 2], cos[:, :Dh // 2]  # shared tables

    def heads(v, W0):  # [L, W] slice of q or k -> [H, L, Dh]
        return (v[:, W0:W0 + W]).reshape(g * g, W // Dh, Dh).transpose(1, 0, 2)

    raw_qkv = x @ ipw + ipb
    imp_qkv = x @ pw + pb
    for h in range(W // Dh):
        q_t = _timm_rope_apply(heads(raw_qkv, 0)[h], sin_h, cos_h)
        k_t = _timm_rope_apply(heads(raw_qkv, W)[h], sin_h, cos_h)
        q_o = heads(imp_qkv, 0)[h] * cos + np.concatenate(
            [-heads(imp_qkv, 0)[h][:, Dh // 2:], heads(imp_qkv, 0)[h][:, :Dh // 2]], -1) * sin
        k_o = heads(imp_qkv, W)[h] * cos + np.concatenate(
            [-heads(imp_qkv, W)[h][:, Dh // 2:], heads(imp_qkv, W)[h][:, :Dh // 2]], -1) * sin
        np.testing.assert_allclose(q_o @ k_o.T, q_t @ k_t.T, atol=1e-9)
    # v stream untouched by the import permutation
    np.testing.assert_array_equal(imp_qkv[:, 2 * W:], raw_qkv[:, 2 * W:])


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------

class _TorchEva2Block(nn.Module):
    def __init__(self, dim, heads, hidden, swiglu, inner_norm, post_norm, fused):
        super().__init__()
        self.heads, self.swiglu, self.post_norm = heads, swiglu, post_norm
        self.fused = fused
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        if fused:
            self.qkv = nn.Parameter(torch.empty(3 * dim, dim))
            self.q_bias = nn.Parameter(torch.zeros(dim))
            self.v_bias = nn.Parameter(torch.zeros(dim))
        else:
            self.q_proj = nn.Linear(dim, dim)
            self.k_proj = nn.Linear(dim, dim, bias=False)
            self.v_proj = nn.Linear(dim, dim)
        self.inner = nn.LayerNorm(dim, eps=1e-6) if inner_norm else None
        self.proj = nn.Linear(dim, dim)
        if swiglu:
            self.fc1_g = nn.Linear(dim, hidden)
            self.fc1_x = nn.Linear(dim, hidden)
            self.mlp_norm = nn.LayerNorm(hidden, eps=1e-6)
            self.fc2 = nn.Linear(hidden, dim)
        else:
            self.fc1 = nn.Linear(dim, hidden)
            self.fc2 = nn.Linear(hidden, dim)

    def _attn(self, h, rope):
        B, L, D = h.shape
        hd = D // self.heads
        if self.fused:
            bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias), self.v_bias])
            qkv = F.linear(h, self.qkv, bias).reshape(B, L, 3, self.heads, hd)
            q, k, v = qkv.unbind(2)
        else:
            q = self.q_proj(h).reshape(B, L, self.heads, hd)
            k = self.k_proj(h).reshape(B, L, self.heads, hd)
            v = self.v_proj(h).reshape(B, L, self.heads, hd)
        if rope is not None:
            sin, cos = rope  # [L, hd]
            def rot(x):
                half = hd // 2
                r = torch.cat([-x[..., half:], x[..., :half]], dim=-1)
                return x * cos[None, :, None, :] + r * sin[None, :, None, :]
            q, k = rot(q), rot(k)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        out = out.transpose(1, 2).reshape(B, L, D)
        if self.inner is not None:
            out = self.inner(out)
        return self.proj(out)

    def _mlp(self, h):
        if self.swiglu:
            return self.fc2(self.mlp_norm(F.silu(self.fc1_g(h)) * self.fc1_x(h)))
        return self.fc2(F.gelu(self.fc1(h)))

    def forward(self, x, rope):
        if self.post_norm:
            x = x + self.norm1(self._attn(x, rope))
            return x + self.norm2(self._mlp(x))
        x = x + self._attn(self.norm1(x), rope)
        return x + self._mlp(self.norm2(x))


class _TorchEva2(nn.Module):
    def __init__(self, cfg, embed_dim):
        super().__init__()
        D = cfg.width
        self.cfg = cfg
        self.patch_embed_proj = nn.Conv2d(3, D, cfg.patch_size, cfg.patch_size)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
        self.pos_embed = nn.Parameter(torch.zeros(1, cfg.seq_len, D))
        self.blocks = nn.ModuleList([
            _TorchEva2Block(D, cfg.heads, cfg.swiglu_hidden, cfg.swiglu,
                            cfg.inner_attn_norm, cfg.post_norm, cfg.qkv_fused)
            for _ in range(cfg.layers)
        ])
        self.norm = nn.LayerNorm(D, eps=1e-6)
        self.head = nn.Linear(D, embed_dim)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed_proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        rope = None
        if self.cfg.use_rope:
            sin, cos = rope_sin_cos(self.cfg.grid, self.cfg.grid,
                                    self.cfg.head_width,
                                    self.cfg.rope_temperature,
                                    self.cfg.ref_feat_shape)
            rope = (torch.from_numpy(np.asarray(sin)), torch.from_numpy(np.asarray(cos)))
        for blk in self.blocks:
            x = blk(x, rope)
        x = self.norm(x)
        return self.head(x[:, 0])

    def timm_state_dict(self):
        sd = {}
        sd["visual.trunk.patch_embed.proj.weight"] = self.patch_embed_proj.weight.detach().numpy()
        sd["visual.trunk.patch_embed.proj.bias"] = self.patch_embed_proj.bias.detach().numpy()
        sd["visual.trunk.cls_token"] = self.cls_token.detach().numpy()
        sd["visual.trunk.pos_embed"] = self.pos_embed.detach().numpy()
        sd["visual.trunk.norm.weight"] = self.norm.weight.detach().numpy()
        sd["visual.trunk.norm.bias"] = self.norm.bias.detach().numpy()
        sd["visual.trunk.head.weight"] = self.head.weight.detach().numpy()
        sd["visual.trunk.head.bias"] = self.head.bias.detach().numpy()
        for i, blk in enumerate(self.blocks):
            pre = f"visual.trunk.blocks.{i}"
            sd[f"{pre}.norm1.weight"] = blk.norm1.weight.detach().numpy()
            sd[f"{pre}.norm1.bias"] = blk.norm1.bias.detach().numpy()
            sd[f"{pre}.norm2.weight"] = blk.norm2.weight.detach().numpy()
            sd[f"{pre}.norm2.bias"] = blk.norm2.bias.detach().numpy()
            if blk.fused:
                sd[f"{pre}.attn.qkv.weight"] = blk.qkv.detach().numpy()
                sd[f"{pre}.attn.q_bias"] = blk.q_bias.detach().numpy()
                sd[f"{pre}.attn.v_bias"] = blk.v_bias.detach().numpy()
            else:
                sd[f"{pre}.attn.q_proj.weight"] = blk.q_proj.weight.detach().numpy()
                sd[f"{pre}.attn.q_proj.bias"] = blk.q_proj.bias.detach().numpy()
                sd[f"{pre}.attn.k_proj.weight"] = blk.k_proj.weight.detach().numpy()
                sd[f"{pre}.attn.v_proj.weight"] = blk.v_proj.weight.detach().numpy()
                sd[f"{pre}.attn.v_proj.bias"] = blk.v_proj.bias.detach().numpy()
            if blk.inner is not None:
                sd[f"{pre}.attn.norm.weight"] = blk.inner.weight.detach().numpy()
                sd[f"{pre}.attn.norm.bias"] = blk.inner.bias.detach().numpy()
            sd[f"{pre}.attn.proj.weight"] = blk.proj.weight.detach().numpy()
            sd[f"{pre}.attn.proj.bias"] = blk.proj.bias.detach().numpy()
            if blk.swiglu:
                sd[f"{pre}.mlp.fc1_g.weight"] = blk.fc1_g.weight.detach().numpy()
                sd[f"{pre}.mlp.fc1_g.bias"] = blk.fc1_g.bias.detach().numpy()
                sd[f"{pre}.mlp.fc1_x.weight"] = blk.fc1_x.weight.detach().numpy()
                sd[f"{pre}.mlp.fc1_x.bias"] = blk.fc1_x.bias.detach().numpy()
                sd[f"{pre}.mlp.norm.weight"] = blk.mlp_norm.weight.detach().numpy()
                sd[f"{pre}.mlp.norm.bias"] = blk.mlp_norm.bias.detach().numpy()
            else:
                sd[f"{pre}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
                sd[f"{pre}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
            sd[f"{pre}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
            sd[f"{pre}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        return sd


@pytest.mark.parametrize("trunk", ["eva02_test_trv", "eva02_test_post",
                                   "eva02_test_split"])
def test_eva02_forward_parity(trunk):
    cfg = _cfg(trunk)
    torch.manual_seed(0)
    oracle = _TorchEva2(cfg.vision, cfg.embed_dim)
    for p in oracle.parameters():
        if p.ndim >= 2:
            nn.init.normal_(p, std=0.05)
        else:
            nn.init.normal_(p, std=0.02)

    sd = {k: v for k, v in oracle.timm_state_dict().items()}
    from latteclip_tpu.models.eva02 import eva02_forward

    visual = pt_state_dict_to_params(
        {**sd, "logit_scale": np.zeros(()),
         "token_embedding.weight": np.zeros((49408, 32), np.float32),
         "positional_embedding": np.zeros((77, 32), np.float32),
         "ln_final.weight": np.ones(32, np.float32),
         "ln_final.bias": np.zeros(32, np.float32),
         "text_projection": np.zeros((32, 16), np.float32),
         **{f"transformer.resblocks.{i}.{suf}": _zeros_for(suf)
            for i in range(2) for suf in _TEXT_SUFFIXES}},
        cfg,
    )[0]["visual"]

    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = eva02_forward(visual, cfg.vision, jnp.asarray(imgs), dtype=jnp.float32)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)


_TEXT_SUFFIXES = [
    "ln_1.weight", "ln_1.bias", "attn.in_proj_weight", "attn.in_proj_bias",
    "attn.out_proj.weight", "attn.out_proj.bias", "ln_2.weight", "ln_2.bias",
    "mlp.c_fc.weight", "mlp.c_fc.bias", "mlp.c_proj.weight", "mlp.c_proj.bias",
]


def _zeros_for(suffix):
    W = 32
    shapes = {
        "ln_1.weight": (W,), "ln_1.bias": (W,),
        "attn.in_proj_weight": (3 * W, W), "attn.in_proj_bias": (3 * W,),
        "attn.out_proj.weight": (W, W), "attn.out_proj.bias": (W,),
        "ln_2.weight": (W,), "ln_2.bias": (W,),
        "mlp.c_fc.weight": (4 * W, W), "mlp.c_fc.bias": (4 * W,),
        "mlp.c_proj.weight": (W, 4 * W), "mlp.c_proj.bias": (W,),
    }
    arr = np.zeros(shapes[suffix], np.float32)
    if suffix.endswith("ln_1.weight") or suffix.endswith("ln_2.weight"):
        arr[:] = 1.0
    return arr


@pytest.mark.parametrize("trunk", ["eva02_test_trv", "eva02_test_post",
                                   "eva02_test_split"])
def test_eva02_state_dict_roundtrip(trunk):
    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg(trunk)
    p = init_clip_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_pt_state_dict(p, cfg)
    p2, _bank = pt_state_dict_to_params(sd, cfg)
    fa = jax.tree_util.tree_flatten(p["visual"])[0]
    fb = jax.tree_util.tree_flatten(p2["visual"])[0]
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eva02_registry_resolves():
    from latteclip_tpu.core.config import Eva02VisionConfig, get_model_config

    for name in ("EVA02-B-16", "EVA02-L-14", "EVA02-L-14-336",
                  "EVA02-E-14", "EVA02-E-14-plus"):
        cfg = get_model_config(name)
        assert isinstance(cfg.vision, Eva02VisionConfig), name
    assert get_model_config("EVA02-L-14-336").vision.image_size == 336
    e = get_model_config("EVA02-E-14").vision
    assert e.post_norm and not e.use_rope and not e.swiglu
