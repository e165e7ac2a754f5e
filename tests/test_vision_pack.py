"""Vision pair-packing: two short-L images per 128-lane attention row.

`vit_forward` packs image pairs ([B, L] -> [B/2, 2L]) through the
segment-masked attention kernel when both fit one lane tile
(`LATTECLIP_VISION_PACK`, models/vit.py). The block-diagonal mask makes the
attention math identical to the unpacked tower — these tests pin value and
gradient equality plus the fallback conditions. The reference has no
analogue: its nn.MultiheadAttention pads every sequence independently
(reference src/open_clip/transformer.py:202).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import VisionConfig
from latteclip_tpu.models import vit as V


@pytest.fixture
def tiny():
    cfg = VisionConfig(image_size=48, layers=3, width=64, patch_size=8,
                       head_width=16)  # L = 36 + cls = 37; 2L = 74 <= 128
    params = V.init_vit_params(jax.random.PRNGKey(0), cfg, 32)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((8, 48, 48, 3)).astype(np.float32))
    return cfg, params, imgs


def _forced(env):
    """Context-free override of the module-level env gate."""
    old = V._VISION_PACK_ENV
    V._VISION_PACK_ENV = env
    return old


def test_forward_matches_unpacked(tiny):
    cfg, params, imgs = tiny
    old = _forced("1")
    try:
        on = V.vit_forward(params, cfg, imgs, dtype=jnp.float32)
        V._VISION_PACK_ENV = "0"
        off = V.vit_forward(params, cfg, imgs, dtype=jnp.float32)
    finally:
        V._VISION_PACK_ENV = old
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_unpacked(tiny):
    cfg, params, imgs = tiny

    def loss(p, env):
        old = _forced(env)
        try:
            return jnp.sum(V.vit_forward(p, cfg, imgs, dtype=jnp.float32) ** 2)
        finally:
            V._VISION_PACK_ENV = old

    g_on = jax.grad(lambda p: loss(p, "1"))(params)
    g_off = jax.grad(lambda p: loss(p, "0"))(params)
    for a, b in zip(jax.tree.leaves(g_on), jax.tree.leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_remat_path_matches(tiny):
    cfg, params, imgs = tiny
    old = _forced("1")
    try:
        on = V.vit_forward(params, cfg, imgs, dtype=jnp.float32, remat=True)
        V._VISION_PACK_ENV = "0"
        off = V.vit_forward(params, cfg, imgs, dtype=jnp.float32)
    finally:
        V._VISION_PACK_ENV = old
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               atol=1e-5, rtol=1e-5)


def test_auto_rule():
    # auto: packs only when B is even and both images fit one 128-lane tile
    old = _forced("auto")
    try:
        assert V._pack_pairs(8, 50)       # ViT-B/32: 2*50 = 100 <= 128
        assert not V._pack_pairs(7, 50)   # odd batch falls back
        assert not V._pack_pairs(8, 197)  # ViT-B/16: 2*197 > 128
        V._VISION_PACK_ENV = "0"
        assert not V._pack_pairs(8, 50)   # forced off
    finally:
        V._VISION_PACK_ENV = old


def test_odd_batch_falls_back(tiny):
    cfg, params, imgs = tiny
    old = _forced("auto")
    try:
        out = V.vit_forward(params, cfg, imgs[:7], dtype=jnp.float32)
    finally:
        V._VISION_PACK_ENV = old
    assert out.shape == (7, 32)
