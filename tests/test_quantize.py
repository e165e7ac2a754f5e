"""Int8 inference quantization (models/quantize.py) — counterpart of the
reference's replace_linear / int8 inference mode (utils.py:64-88)."""
import numpy as np
import jax
import jax.numpy as jnp

from latteclip_tpu.core.config import config_from_dict
from latteclip_tpu.models import clip as clip_mod
from latteclip_tpu.models.layers import dense
from latteclip_tpu.models.quantize import (
    dequantize_weight,
    int8_dense,
    quantize_weight,
    replace_linear,
)

TINY = config_from_dict(
    "tiny",
    {
        "embed_dim": 32,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64, "heads": 4, "layers": 2},
    },
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)) * 0.1
    q = quantize_weight(w)
    assert q["int8"].dtype == jnp.int8 and q["scale"].shape == (128,)
    err = np.abs(np.asarray(dequantize_weight(q)) - np.asarray(w))
    # per-channel absmax grid: error <= scale/2 per element
    assert (err <= np.asarray(q["scale"]) / 2 + 1e-7).all()


def test_int8_dense_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal(96).astype(np.float32)) * 0.01
    want = np.asarray(dense(x, w, b, jnp.float32))
    got = np.asarray(int8_dense(x, quantize_weight(w), b, jnp.float32))
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert rel.mean() < 0.02


def test_replace_linear_walks_blocks_and_model_forward():
    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), TINY)
    qparams, n = replace_linear(params)
    # c_fc_w + c_proj_w in both towers' stacked blocks = 4 replacements
    assert n == 4
    assert qparams["visual"]["blocks"]["c_fc_w"]["int8"].dtype == jnp.int8
    assert qparams["visual"]["blocks"]["c_fc_w"]["int8"].shape == (2, 64, 256)
    # untouched leaves stay arrays
    assert not isinstance(qparams["visual"]["blocks"]["in_proj_w"], dict)

    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    toks = jnp.asarray(rng.integers(1, 40000, size=(3, 77)).astype(np.int32))

    f_img = np.asarray(clip_mod.encode_image(params, TINY, imgs, normalize=True))
    q_img = np.asarray(clip_mod.encode_image(qparams, TINY, imgs, normalize=True))
    f_txt = np.asarray(clip_mod.encode_text(params, TINY, toks, normalize=True))
    q_txt = np.asarray(clip_mod.encode_text(qparams, TINY, toks, normalize=True))

    # normalized features stay close -> retrieval/zero-shot rankings survive
    assert np.abs(q_img - f_img).max() < 0.05
    assert np.abs(q_txt - f_txt).max() < 0.05
    cos = (q_img * f_img).sum(-1)
    assert (cos > 0.999).all()


def test_replace_linear_custom_include():
    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), TINY)
    qparams, n = replace_linear(params, include=("in_proj_w", "out_proj_w"))
    assert n == 4 and isinstance(qparams["text"]["blocks"]["in_proj_w"], dict)
