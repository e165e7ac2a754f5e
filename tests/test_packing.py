"""Variable-length sequence packing: packer invariants, segment-masked
attention kernel equivalence, and packed-vs-padded text tower equivalence.

The claim under test: packing real-length caption rows end to end with
segment-id masking (data/packing.py + kernels.attention_core_qkv_segmented)
is EXACT for the CLIP text tower — causal masking + EOT pooling make
cross-segment and post-EOT columns invisible (same argument as
--text-context-cap, reference src/open_clip/tokenizer.py:250-258 pads where
we pack).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latteclip_tpu.data.packing import pack_rows_needed, pack_token_rows
from latteclip_tpu.kernels import attention_core_qkv, attention_core_qkv_segmented
from latteclip_tpu.models.text import init_text_params, text_forward, text_forward_packed
from latteclip_tpu.core.config import TextConfig

CTX = 77
PACK = 128


def _lengths(rng, n, low=6, high=CTX):
    """Long-tail lengths: mostly short with occasional near-ctx outliers."""
    ln = np.minimum(high, low + rng.geometric(0.12, size=n)).astype(np.int64)
    ln[rng.random(n) < 0.05] = high  # a real long tail
    return ln


def _token_rows(rng, n):
    """Padded [n, CTX] rows with SOT..EOT runs; EOT has the highest id."""
    lengths = _lengths(rng, n)
    tokens = np.zeros((n, CTX), np.int32)
    for i, ln in enumerate(lengths):
        tokens[i, :ln] = rng.integers(1, 40000, size=ln)
        tokens[i, ln - 1] = 49407  # EOT: highest id (argmax pooling)
    return tokens, lengths


def test_packer_invariants():
    rng = np.random.default_rng(0)
    tokens, lengths = _token_rows(rng, 64)
    packed = pack_token_rows(tokens, lengths, PACK)

    assert packed.tokens.shape == packed.seg_ids.shape == packed.positions.shape
    assert packed.tokens.shape[1] == PACK
    assert packed.tokens.shape[0] == pack_rows_needed(lengths, PACK)
    # every sequence reconstructs exactly from its packed run
    for n, ln in enumerate(lengths):
        r, c = packed.eot_row[n], packed.eot_col[n]
        start = c - ln + 1
        np.testing.assert_array_equal(
            packed.tokens[r, start:c + 1], tokens[n, :ln]
        )
        np.testing.assert_array_equal(
            packed.positions[r, start:c + 1], np.arange(ln)
        )
        seg = packed.seg_ids[r, start:c + 1]
        assert (seg == seg[0]).all() and seg[0] >= 1
    total = int(lengths.sum())
    assert int((packed.seg_ids > 0).sum()) == total
    # rows= pins a bigger static shape
    packed2 = pack_token_rows(tokens, lengths, PACK, rows=packed.tokens.shape[0] + 3)
    assert packed2.tokens.shape[0] == packed.tokens.shape[0] + 3
    with pytest.raises(ValueError):
        pack_token_rows(tokens, lengths, PACK, rows=1)


@pytest.mark.parametrize("causal", [True, False])
def test_segmented_attention_matches_per_sequence(causal):
    """Packed segment-masked attention == per-sequence unpacked attention."""
    rng = np.random.default_rng(1)
    H, D = 4, 16
    HD = H * D
    lengths = np.array([5, 9, 3, 17, 30, 2, 31, 20, 8, 3])
    P = 32
    N = len(lengths)
    # independent per-sequence qkv, placed into packed rows
    seqs = [rng.standard_normal((ln, 3 * HD)).astype(np.float32) for ln in lengths]

    packed = pack_token_rows(
        np.ones((N, P), np.int32), lengths, P
    )
    R = packed.tokens.shape[0]
    qkv_packed = np.zeros((R, P, 3 * HD), np.float32)
    for n, ln in enumerate(lengths):
        r, c = packed.eot_row[n], packed.eot_col[n]
        qkv_packed[r, c - ln + 1:c + 1] = seqs[n]

    out_packed = attention_core_qkv_segmented(
        jnp.asarray(qkv_packed), H, jnp.asarray(packed.seg_ids), causal,
        dtype=jnp.float32,
    )
    for n, ln in enumerate(lengths):
        ref = attention_core_qkv(
            jnp.asarray(seqs[n])[None], H, causal, dtype=jnp.float32
        )[0]
        r, c = packed.eot_row[n], packed.eot_col[n]
        got = out_packed[r, c - ln + 1:c + 1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_segmented_attention_grad_matches():
    """Grads flow through the segment mask identically per sequence."""
    rng = np.random.default_rng(2)
    H, D = 2, 8
    HD = H * D
    lengths = np.array([5, 11, 3, 13])
    P = 16
    packed = pack_token_rows(np.ones((4, P), np.int32), lengths, P)
    R = packed.tokens.shape[0]
    qkv_packed = np.zeros((R, P, 3 * HD), np.float32)
    spans = []
    for n, ln in enumerate(lengths):
        r, c = packed.eot_row[n], packed.eot_col[n]
        seq = rng.standard_normal((ln, 3 * HD)).astype(np.float32)
        qkv_packed[r, c - ln + 1:c + 1] = seq
        spans.append((r, c - ln + 1, c + 1, seq))

    seg = jnp.asarray(packed.seg_ids)

    def packed_loss(x):
        o = attention_core_qkv_segmented(x, H, seg, True, dtype=jnp.float32)
        return jnp.sum(jnp.sin(o))

    g_packed = jax.grad(packed_loss)(jnp.asarray(qkv_packed))

    for r, a, b, seq in spans:
        def single_loss(x):
            o = attention_core_qkv(x[None], H, True, dtype=jnp.float32)[0]
            return jnp.sum(jnp.sin(o))

        g_ref = jax.grad(single_loss)(jnp.asarray(seq))
        np.testing.assert_allclose(
            np.asarray(g_packed[r, a:b]), np.asarray(g_ref),
            atol=2e-5, rtol=2e-5,
        )
    # padding positions receive zero gradient
    pad = np.asarray(packed.seg_ids) == 0
    np.testing.assert_allclose(np.asarray(g_packed)[pad], 0.0, atol=2e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_packed_text_tower_matches_padded(remat):
    """text_forward_packed == text_forward on the same captions (f32)."""
    cfg = TextConfig(context_length=CTX, vocab_size=49408, width=64, heads=4,
                     layers=2, mlp_ratio=4.0, pool_type="argmax")
    rng_np = np.random.default_rng(3)
    params = init_text_params(jax.random.PRNGKey(0), cfg, embed_dim=32)

    tokens, lengths = _token_rows(rng_np, 24)
    packed = pack_token_rows(tokens, lengths, PACK)

    ref = text_forward(params, cfg, jnp.asarray(tokens), dtype=jnp.float32)
    got = text_forward_packed(
        params, cfg,
        jnp.asarray(packed.tokens), jnp.asarray(packed.positions),
        jnp.asarray(packed.seg_ids), jnp.asarray(packed.eot_row),
        jnp.asarray(packed.eot_col),
        dtype=jnp.float32, remat=remat,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_packed_text_tower_param_grads_match():
    """Param grads of a pooled-feature loss agree packed vs padded."""
    cfg = TextConfig(context_length=CTX, vocab_size=49408, width=64, heads=4,
                     layers=2, mlp_ratio=4.0, pool_type="argmax")
    rng_np = np.random.default_rng(4)
    params = init_text_params(jax.random.PRNGKey(1), cfg, embed_dim=32)
    tokens, lengths = _token_rows(rng_np, 12)
    packed = pack_token_rows(tokens, lengths, PACK)

    def loss_padded(p):
        f = text_forward(p, cfg, jnp.asarray(tokens), dtype=jnp.float32)
        return jnp.sum(jnp.cos(f))

    def loss_packed(p):
        f = text_forward_packed(
            p, cfg, jnp.asarray(packed.tokens), jnp.asarray(packed.positions),
            jnp.asarray(packed.seg_ids), jnp.asarray(packed.eot_row),
            jnp.asarray(packed.eot_col), dtype=jnp.float32,
        )
        return jnp.sum(jnp.cos(f))

    g_a = jax.grad(loss_padded)(params)
    g_b = jax.grad(loss_packed)(params)
    flat_a, _ = jax.tree_util.tree_flatten(g_a)
    flat_b, _ = jax.tree_util.tree_flatten(g_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
