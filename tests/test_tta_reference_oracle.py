"""TTA components vs the reference's REAL classes — and why only components.

The reference's TTA dispatch is dead-on-arrival as shipped:
``evaluate_tta`` (train.py:1216-1305) calls ``model.set_class_features`` /
``model.reset`` on the CustomCLIP that main.py passes in, but those methods
exist only on ``CLIPRewards``/``PromptLearner`` — which main.py NEVER
constructs; and ``CLIPRewards.set_class_features`` itself stores the return
of ``BaseRewards.extract_text_features`` which is a ``pass`` stub
(model.py:39-45), so even the rewards object would carry
``class_features=None`` into ``CLIPScore``. These facts are pinned by tests
below so the parity record is durable.

What CAN be driven as-is are the building blocks our ``eval/tta.py``
implements the intended algorithms from: ``PromptLearner`` (prompt
assembly + ctx init, model.py:995-1213), ``TextEncoder`` (prompt encoding,
model.py:971-991), ``select_confident_samples`` and ``avg_entropy``
(train.py:285-288, 1175-1180) — including a GRADIENT-level A/B through
both text stacks, which is what the TPT inner loop actually optimizes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_oracle import load_reference_open_clip  # noqa: E402

from latteclip_tpu.core.checkpoint import params_to_pt_state_dict  # noqa: E402
from latteclip_tpu.core.config import config_from_dict  # noqa: E402
from latteclip_tpu.eval.tta import (  # noqa: E402
    avg_entropy,
    build_prompt_context,
    prompt_text_features,
    select_confident,
)
from latteclip_tpu.models.clip import init_clip_params  # noqa: E402
from latteclip_tpu.models.tokenizer import get_tokenizer  # noqa: E402

CLASSES = ["banded", "dotted", "striped", "zigzagged"]
CFG = config_from_dict(
    "tiny-tta",
    {
        "embed_dim": 16,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                     "heads": 4, "layers": 2},
    },
)
# The reference's TextEncoder (model.py:979-982, transcribed from CoOp where
# OpenAI-CLIP's transformer carries a BAKED-IN causal mask) calls
# ``self.transformer(x)`` with no attn_mask — under OpenCLIP modules that
# silently encodes prompts WITHOUT causality (latent bug #?; CLIP.encode_text
# itself passes self.attn_mask, model.py:425). Our production TTA keeps the
# intended causal mask; the parity tests below compare against the
# reference's actual (maskless) computation using a no-causal config.
CFG_REF_SEMANTICS = config_from_dict(
    "tiny-tta-nocausal",
    {
        "embed_dim": 16,
        "compute_dtype": "float32",
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 64,
                     "heads": 4, "layers": 2, "no_causal_mask": True},
    },
)


def _ref_model_and_params():
    oc = load_reference_open_clip()
    if oc is None:
        pytest.skip("reference checkout or torch unavailable")
    params = init_clip_params(jax.random.PRNGKey(11), CFG)
    ref_clip = oc.model.CLIP(
        embed_dim=CFG.embed_dim,
        vision_cfg={"image_size": 32, "layers": 2, "width": 64, "patch_size": 16},
        text_cfg={"context_length": 77, "vocab_size": 49408, "width": 64,
                  "heads": 4, "layers": 2},
    )
    sd = {k: torch.from_numpy(v) for k, v in
          params_to_pt_state_dict(params, CFG).items()}
    _missing, unexpected = ref_clip.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    return oc, ref_clip, params


def _ref_prompt_learner(oc, ref_clip):
    # PromptLearner needs the SimpleTokenizer OBJECT (it calls both
    # tokenizer(text) and tokenizer.encode(text) — model.py:1027,1051),
    # not the module-level tokenize function main.py uses elsewhere
    from open_clip.tokenizer import _tokenizer

    return oc.model.PromptLearner(
        ref_clip, CLASSES, _tokenizer, n_ctx=4, ctx_init="a photo of a",
    )


def test_prompt_learner_and_text_encoder_parity():
    oc, ref_clip, params = _ref_model_and_params()
    tok = get_tokenizer()
    pl = _ref_prompt_learner(oc, ref_clip)
    enc = oc.model.TextEncoder(ref_clip)

    prompt = build_prompt_context(params, CFG, tok, CLASSES,
                                  ctx_init="a photo of a")
    # same initial context vectors (embedding rows of "a photo of a")
    np.testing.assert_allclose(
        np.asarray(prompt.init_ctx), pl.ctx.detach().numpy(), atol=1e-6)
    # same eot positions despite the 'X X X X' placeholder prompts
    np.testing.assert_array_equal(
        np.asarray(prompt.eot_pos),
        pl.tokenized_prompts.argmax(dim=-1).numpy())

    ours = np.asarray(prompt_text_features(
        params, CFG_REF_SEMANTICS, prompt, prompt.init_ctx))
    with torch.no_grad():
        theirs = enc(pl(), pl.tokenized_prompts)
        theirs = torch.nn.functional.normalize(theirs, dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
    # and the maskless encode really is different from the causal one —
    # the reference bug is observable, not a tolerance artifact
    causal = np.asarray(prompt_text_features(params, CFG, prompt, prompt.init_ctx))
    assert np.abs(causal - theirs).max() > 1e-3


def test_tpt_entropy_gradient_parity():
    """d avg_entropy / d ctx through the REAL PromptLearner+TextEncoder vs
    our prompt_text_features — the quantity the TPT inner loop steps on."""
    oc, ref_clip, params = _ref_model_and_params()
    from ref_oracle import REF_ROOT
    import sys

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from training import train as ref_train

    tok = get_tokenizer()
    prompt = build_prompt_context(params, CFG, tok, CLASSES,
                                  ctx_init="a photo of a")
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((8, CFG.embed_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    scale = float(np.exp(np.asarray(params["logit_scale"])))

    def our_loss(ctx):
        text = prompt_text_features(params, CFG_REF_SEMANTICS, prompt, ctx)
        return avg_entropy(scale * jnp.asarray(feats) @ text.T)

    g_ours = np.asarray(jax.grad(our_loss)(prompt.init_ctx))

    pl = _ref_prompt_learner(oc, ref_clip)
    enc = oc.model.TextEncoder(ref_clip)
    out = enc(pl(), pl.tokenized_prompts)
    text = torch.nn.functional.normalize(out, dim=-1)
    logits = scale * torch.from_numpy(feats) @ text.t()
    loss = ref_train.avg_entropy(logits)
    loss.backward()
    g_ref = pl.ctx.grad.detach().numpy()

    np.testing.assert_allclose(g_ours, g_ref, atol=5e-5)
    assert np.abs(g_ref).max() > 1e-6  # the comparison is not vacuous


def test_select_confident_and_avg_entropy_parity():
    from ref_oracle import REF_ROOT
    import sys

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    oc = load_reference_open_clip()
    if oc is None:
        pytest.skip("reference unavailable")
    from training import train as ref_train

    rng = np.random.default_rng(5)
    logits = rng.standard_normal((16, 7)).astype(np.float32) * 3
    t = torch.from_numpy(logits)

    ref_out, ref_idx = ref_train.select_confident_samples(t, 0.25)
    ours_idx = np.asarray(select_confident(jnp.asarray(logits), 0.25))
    assert sorted(ours_idx.tolist()) == sorted(ref_idx.numpy().tolist())

    ref_ent = float(ref_train.avg_entropy(t))
    our_ent = float(avg_entropy(jnp.asarray(logits)))
    assert abs(ref_ent - our_ent) < 1e-5


def test_reference_tta_dispatch_is_broken_as_shipped():
    """Pins the latent bugs that make a full evaluate_tta A/B impossible:
    (a) the CustomCLIP main.py passes in lacks the TTA interface; (b) even
    CLIPRewards carries class_features=None because BaseRewards'
    extractors are `pass` stubs (model.py:36-45)."""
    oc, ref_clip, _params = _ref_model_and_params()
    model = oc.model.CustomCLIP(ref_clip, CLASSES, oc.tokenize)
    assert not hasattr(model, "set_class_features")
    assert not hasattr(model, "reset")

    ref_clip.visual.input_resolution = 32  # attr CLIPRewards requires
    rewards = oc.model.CLIPRewards("cpu", ref_clip)
    rewards.set_class_features(classnames=CLASSES)
    assert rewards.class_features is None  # the pass-stub extractor
    with pytest.raises(TypeError):
        rewards.CLIPScore(class_index=torch.tensor([0]), pairwise=False)
