"""Numerical parity of the JAX towers vs the reference torch CLIP.

The reference model (randomly initialised) is the oracle; its state dict is
mapped through our checkpoint loader and both sides encode identical inputs.
This one test validates the checkpoint key mapping, the patchify math, the
attention/MLP/LayerNorm numerics, and EOT pooling simultaneously.
"""
import dataclasses

import numpy as np
import pytest

from latteclip_tpu.core.checkpoint import params_to_pt_state_dict, pt_state_dict_to_params
from latteclip_tpu.core.config import config_from_dict

from ref_oracle import load_reference_open_clip

SMALL = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
    "text_cfg": {"context_length": 24, "vocab_size": 128, "width": 32, "heads": 4, "layers": 2},
}

pytestmark = pytest.mark.skipif(
    load_reference_open_clip() is None, reason="reference oracle unavailable"
)


def _small_pair(quick_gelu=False):
    import torch

    cfg_dict = dict(SMALL)
    if quick_gelu:
        cfg_dict["quick_gelu"] = True
    # build reference model of the same architecture
    oc = load_reference_open_clip()
    torch.manual_seed(0)
    ref = oc.model.CLIP(
        embed_dim=cfg_dict["embed_dim"],
        vision_cfg=cfg_dict["vision_cfg"],
        text_cfg=cfg_dict["text_cfg"],
        quick_gelu=quick_gelu,
    ).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = dataclasses.replace(config_from_dict("small", cfg_dict), compute_dtype="float32")
    params, bank = pt_state_dict_to_params(sd, cfg)
    assert bank == {}
    return ref, cfg, params


def _inputs(cfg, batch=3, seed=42):
    rng = np.random.RandomState(seed)
    images = rng.rand(batch, cfg.vision.image_size, cfg.vision.image_size, 3).astype(np.float32)
    ctx = cfg.text.context_length
    tokens = np.zeros((batch, ctx), dtype=np.int32)
    for i in range(batch):
        n = rng.randint(3, ctx - 1)
        tokens[i, :n] = rng.randint(1, cfg.text.vocab_size - 2, size=n)
        tokens[i, n] = cfg.text.vocab_size - 1  # highest id acts as EOT for argmax pool
    return images, tokens


@pytest.mark.parametrize("quick_gelu", [False, True])
def test_feature_parity(quick_gelu):
    import torch

    from latteclip_tpu.models.clip import encode_image, encode_text

    ref, cfg, params = _small_pair(quick_gelu)
    images, tokens = _inputs(cfg)

    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images.transpose(0, 3, 1, 2)), normalize=True).numpy()
        ref_txt = ref.encode_text(torch.from_numpy(tokens).long(), normalize=True).numpy()

    our_img = np.asarray(encode_image(params, cfg, images, normalize=True))
    our_txt = np.asarray(encode_text(params, cfg, tokens, normalize=True))

    np.testing.assert_allclose(our_img, ref_img, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(our_txt, ref_txt, atol=2e-5, rtol=1e-4)


def test_state_dict_roundtrip():
    ref, cfg, params = _small_pair()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    back = params_to_pt_state_dict(params, cfg)
    missing = set(sd) - set(back) - {"attn_mask"}  # attn_mask is a non-persistent buffer
    assert not missing, missing
    for k in back:
        np.testing.assert_allclose(back[k], sd[k], atol=1e-6, err_msg=k)


def test_bf16_close_to_f32():
    """bf16 compute path should stay within contrastive-learning tolerance."""
    import dataclasses as dc

    from latteclip_tpu.models.clip import encode_image

    ref, cfg, params = _small_pair()
    images, _ = _inputs(cfg)
    f32 = np.asarray(encode_image(params, cfg, images, normalize=True))
    bf16_cfg = dc.replace(cfg, compute_dtype="bfloat16")
    bf16 = np.asarray(encode_image(params, bf16_cfg, images, normalize=True))
    assert np.abs(f32 - bf16).max() < 0.05
    # cosine similarity of features must remain ~1
    cos = (f32 * bf16).sum(-1)
    assert cos.min() > 0.995


RN_SMALL = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 8},
    "text_cfg": {"context_length": 24, "vocab_size": 128, "width": 32, "heads": 4, "layers": 2},
}


def test_resnet_feature_parity():
    """ModifiedResNet tower vs the reference torch implementation."""
    import torch

    from latteclip_tpu.models.clip import encode_image

    oc = load_reference_open_clip()
    torch.manual_seed(0)
    ref = oc.model.CLIP(
        embed_dim=RN_SMALL["embed_dim"],
        vision_cfg=RN_SMALL["vision_cfg"],
        text_cfg=RN_SMALL["text_cfg"],
    ).eval()
    gen = torch.Generator().manual_seed(2)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        # give BN non-trivial running stats
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.1)
                m.running_var.copy_(1.0 + 0.2 * torch.rand(m.running_var.shape, generator=gen))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = dataclasses.replace(config_from_dict("rn_small", RN_SMALL), compute_dtype="float32")
    params, _bank = pt_state_dict_to_params(sd, cfg)

    rng = np.random.RandomState(7)
    images = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref.encode_image(torch.from_numpy(images.transpose(0, 3, 1, 2)), normalize=True).numpy()
    ours = np.asarray(encode_image(params, cfg, images, normalize=True))
    np.testing.assert_allclose(ours, ref_feats, atol=5e-5, rtol=1e-4)

    # round-trip of the resnet state dict
    back = params_to_pt_state_dict(params, cfg)
    for k in back:
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_allclose(back[k], sd[k], atol=1e-6, err_msg=k)


def test_layerscale_parity():
    """LayerScale blocks (ls_init_value) match the reference."""
    import torch

    from latteclip_tpu.models.clip import encode_image

    cfg_dict = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16, "ls_init_value": 0.1},
        "text_cfg": {"context_length": 24, "vocab_size": 128, "width": 32, "heads": 4, "layers": 2, "ls_init_value": 0.1},
    }
    oc = load_reference_open_clip()
    torch.manual_seed(0)
    ref = oc.model.CLIP(embed_dim=32, vision_cfg=cfg_dict["vision_cfg"], text_cfg=cfg_dict["text_cfg"]).eval()
    gen = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = dataclasses.replace(config_from_dict("ls_small", cfg_dict), compute_dtype="float32")
    params, _ = pt_state_dict_to_params(sd, cfg)
    assert "ls_1_gamma" in params["visual"]["blocks"]
    images, tokens = _inputs(cfg, batch=2)
    with torch.no_grad():
        ref_img = ref.encode_image(torch.from_numpy(images.transpose(0, 3, 1, 2)), normalize=True).numpy()
    ours = np.asarray(encode_image(params, cfg, images, normalize=True))
    np.testing.assert_allclose(ours, ref_img, atol=3e-5, rtol=1e-4)
