"""ConvNeXt tower parity vs an independently-written torch oracle.

The reference reaches ConvNeXt through timm (``src/open_clip/timm_model.py``),
and timm is not installed in either environment — so the oracle here is a
minimal torch ConvNeXt written directly from the published architecture
(timm ``convnext.py`` semantics: channels-last block norm/MLP, LayerScale
``gamma``, eps 1e-6 everywhere, trunk avg-pool + head norm, adapter proj with
``proj_bias=False``). It emits timm-style state-dict keys so the test also
validates the checkpoint mapper (core/checkpoint.py::_convnext_visual_*).
"""
import dataclasses

import numpy as np
import pytest

from latteclip_tpu.core.checkpoint import params_to_pt_state_dict, pt_state_dict_to_params
from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models import convnext as cnx

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

# tiny trunk registered for tests only (full trunks are too slow for CPU CI)
NANO = ((1, 1, 2, 1), (16, 24, 40, 64))


@pytest.fixture(autouse=True)
def _register_nano():
    cnx.CONVNEXT_TRUNKS["convnext_test_nano"] = NANO
    yield
    cnx.CONVNEXT_TRUNKS.pop("convnext_test_nano", None)


class _LN2d(nn.LayerNorm):
    """channels-first LayerNorm (timm LayerNorm2d)."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class _Block(nn.Module):
    def __init__(self, dim, ls_init=1e-6):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(ls_init * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp.fc2(F.gelu(self.mlp.fc1(x)))
        x = self.gamma * x
        return shortcut + x.permute(0, 3, 1, 2)


class _TorchConvNeXt(nn.Module):
    """timm-keyed trunk + OpenCLIP TimmModel head (timm_model.py:91-108)."""

    def __init__(self, depths, dims, embed_dim, proj="linear"):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4), _LN2d(dims[0], eps=1e-6))
        self.stages = nn.ModuleList()
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    _LN2d(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, stride=2))
            stage.blocks = nn.ModuleList(_Block(dim) for _ in range(depth))
            self.stages.append(stage)
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.proj_kind = proj
        if proj == "linear":
            self.adapter_proj = nn.Linear(dims[-1], embed_dim, bias=False)
        else:  # timm Mlp(prev, 2*embed, embed, bias=(True, False))
            self.adapter_fc1 = nn.Linear(dims[-1], 2 * embed_dim)
            self.adapter_fc2 = nn.Linear(2 * embed_dim, embed_dim, bias=False)

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
        x = x.mean(dim=(-2, -1))
        x = self.head.norm(x)
        if self.proj_kind == "linear":
            return self.adapter_proj(x)
        return self.adapter_fc2(F.gelu(self.adapter_fc1(x)))

    def timm_state_dict(self):
        """Rename to the OpenCLIP-checkpoint layout (visual.trunk.* etc.)."""
        out = {}
        for k, v in self.state_dict().items():
            if k.startswith("adapter_proj."):
                k = "visual.head.proj." + k[len("adapter_proj."):]
            elif k.startswith("adapter_fc1."):
                k = "visual.head.mlp.fc1." + k[len("adapter_fc1."):]
            elif k.startswith("adapter_fc2."):
                k = "visual.head.mlp.fc2." + k[len("adapter_fc2."):]
            else:
                k = "visual.trunk." + k
            out[k] = v.detach().numpy()
        return out


def _cfg(proj="linear", image_size=32):
    raw = {
        "embed_dim": 24,
        "vision_cfg": {
            "timm_model_name": "convnext_test_nano",
            "timm_pool": "", "timm_proj": proj,
            "timm_drop_path": 0.1, "image_size": image_size,
        },
        "text_cfg": {"context_length": 16, "vocab_size": 64,
                     "width": 24, "heads": 4, "layers": 2},
    }
    return dataclasses.replace(config_from_dict("cnx_test", raw), compute_dtype="float32")


def _oracle_pair(proj):
    torch.manual_seed(0)
    ref = _TorchConvNeXt(NANO[0], NANO[1], 24, proj=proj).eval()
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    return ref


@pytest.mark.parametrize("proj", ["linear", "mlp"])
def test_convnext_feature_parity(proj):
    from latteclip_tpu.models.clip import encode_image
    from latteclip_tpu.models.text import init_text_params

    import jax

    ref = _oracle_pair(proj)
    cfg = _cfg(proj)
    sd = ref.timm_state_dict()
    # the mapper needs full-CLIP keys; graft a text tower + logit_scale
    sd["logit_scale"] = np.zeros(())
    text = init_text_params(jax.random.PRNGKey(0), cfg.text, cfg.embed_dim)
    params, _bank = pt_state_dict_to_params({**sd, **_text_sd(text)}, cfg)

    rng = np.random.RandomState(11)
    images = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(images.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(encode_image(params, cfg, images))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def _text_sd(text_params):
    """Minimal classic text-tower keys so pt_state_dict_to_params succeeds."""
    from latteclip_tpu.core.checkpoint import _unstack_blocks

    t = {k: np.asarray(v, np.float32) for k, v in text_params.items()
         if not isinstance(v, dict)}
    sd = {
        "token_embedding.weight": t["token_embedding"],
        "positional_embedding": t["pos_embed"],
        "ln_final.weight": t["ln_final_scale"],
        "ln_final.bias": t["ln_final_bias"],
        "text_projection": t["text_projection"],
    }
    sd.update(_unstack_blocks(
        {k: np.asarray(v, np.float32) for k, v in text_params["blocks"].items()},
        "transformer."))
    return sd


def test_convnext_state_dict_roundtrip():
    import jax

    from latteclip_tpu.models.clip import init_clip_params

    cfg = _cfg("mlp")
    params = init_clip_params(jax.random.PRNGKey(1), cfg)
    sd = params_to_pt_state_dict(params, cfg)
    back, _ = pt_state_dict_to_params(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=1e-6,
            err_msg=jax.tree_util.keystr(path))


def test_convnext_drop_path_train_only():
    import jax

    cfg = _cfg("linear")
    p = cnx.init_convnext_params(jax.random.PRNGKey(0), cfg.vision, 24)
    rng = np.random.RandomState(5)
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    eval_a = np.asarray(cnx.convnext_forward(p, cfg.vision, x, dtype=np.float32))
    eval_b = np.asarray(cnx.convnext_forward(p, cfg.vision, x, dtype=np.float32))
    np.testing.assert_array_equal(eval_a, eval_b)  # eval is deterministic
    tr = np.asarray(cnx.convnext_forward(
        p, cfg.vision, x, dtype=np.float32, train=True,
        rng=jax.random.PRNGKey(7)))
    assert np.isfinite(tr).all()
    assert np.abs(tr - eval_a).max() > 0  # stochastic depth engaged
    # remat path is value-identical in eval
    rm = np.asarray(cnx.convnext_forward(p, cfg.vision, x, dtype=np.float32, remat=True))
    np.testing.assert_allclose(rm, eval_a, atol=1e-6)


def test_convnext_registry_configs_resolve():
    """All 11 reference convnext configs parse to ConvNeXtVisionConfig with
    the right trunk dims."""
    from latteclip_tpu.core.config import ConvNeXtVisionConfig, get_model_config

    expect = {
        "convnext_tiny": (1024, 768), "convnext_small": (512, 768),
        "convnext_base": (512, 1024), "convnext_base_w": (640, 1024),
        "convnext_base_w_320": (640, 1024), "convnext_large": (768, 1536),
        "convnext_large_d": (768, 1536), "convnext_large_d_320": (768, 1536),
        "convnext_xlarge": (1024, 2048), "convnext_xxlarge": (1024, 3072),
        "convnext_xxlarge_320": (1024, 3072),
    }
    for name, (embed, width) in expect.items():
        cfg = get_model_config(name)
        assert isinstance(cfg.vision, ConvNeXtVisionConfig), name
        assert cfg.embed_dim == embed, name
        assert cfg.vision.embed_width == width, name
        assert cfg.vision.drop_path == 0.1, name
    assert get_model_config("convnext_large_d").vision.proj == "mlp"
    assert get_model_config("convnext_base").vision.proj == "linear"


def test_convnext_grad_flows():
    """value_and_grad through the tower (remat on) stays finite."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg("linear")
    p = cnx.init_convnext_params(jax.random.PRNGKey(2), cfg.vision, 24)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)

    def loss(p):
        return jnp.sum(cnx.convnext_forward(p, cfg.vision, x, dtype=jnp.float32,
                                            remat=True) ** 2)

    val, grads = jax.value_and_grad(loss)(p)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gamma grads must be nonzero (LayerScale is live)
    g0 = np.asarray(grads["stages"][0]["blocks"]["gamma"])
    assert np.abs(g0).max() > 0
