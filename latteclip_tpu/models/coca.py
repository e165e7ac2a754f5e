"""CoCa: contrastive captioner (reference ``coca_model.py`` +
``transformer.py:565-803``).

Three parts, all pure functions over a param pytree:

* **text tower with class token** (``embed_cls=True``, reference
  transformer.py:598-708) — or, for ``coca_roberta-*`` configs, an HF
  roberta trunk with ``output_tokens`` (``models/hf_text.py``, reference
  coca_model.py:97-103; dispatch in :func:`encode_text_tokens`) —
  the class embedding is appended AFTER the text,
  the attention mask combines causality with per-sample pad masking (padded
  keys are invisible — reference ``build_cls_mask``, transformer.py:663-670),
  pooling takes the last (cls) position and applies ``ln_final`` after
  pooling;
* **vision tower with attentional pooling** returning pooled + token
  embeddings (``models/vit.py`` with ``output_tokens``);
* **multimodal decoder** (reference MultimodalTransformer,
  transformer.py:711-803): per layer a causal self-attention block over the
  text token embeddings followed by a cross-attention block (ln_1_kv on the
  image tokens), then ``ln_final`` and a width→vocab projection producing
  caption logits.

``coca_loss`` reproduces CoCaLoss (loss.py:278-321): weighted contrastive +
caption CE ignoring pad positions. ``generate`` implements greedy / top-k
sampling with a fixed-shape decode loop (one compile, causality makes the
padded suffix invisible); ``generate_beamsearch`` reproduces the reference's
grouped beam search (coca_model.py:268-478) with HF ``BeamSearchScorer``
semantics natively (tests/test_coca.py checks both against the torch oracle).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.core.config import CoCaConfig, TextConfig
from latteclip_tpu.models import layers as L
from latteclip_tpu.models import text as text_mod
from latteclip_tpu.models import vit as vit_mod
from latteclip_tpu.models.layers import Params, l2_normalize
from latteclip_tpu.train.objective import clip_loss
from latteclip_tpu.core.mesh import tpu_jit

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# masked attention helpers (per-sample additive masks — CoCa only, XLA path)
# ---------------------------------------------------------------------------

def _masked_mha(x, kv, p, num_heads, mask, dtype):
    """MHA with an additive mask [B, Lq, Lk] (or None). x: [B, Lq, D].

    For cross attention (kv is not x) the torch in_proj weight splits:
    q-part applies to queries, k/v-parts to the key/value stream.
    """
    B, Lq, D = x.shape
    head = D // num_heads
    w = p["in_proj_w"]  # [D, 3D] ours-convention
    b = p["in_proj_b"]
    q = L.dense(x, w[:, :D], b[:D], dtype)
    k = L.dense(kv, w[:, D:2 * D], b[D:2 * D], dtype)
    v = L.dense(kv, w[:, 2 * D:], b[2 * D:], dtype)
    q = q.reshape(B, Lq, num_heads, head)
    k = k.reshape(B, -1, num_heads, head)
    v = v.reshape(B, -1, num_heads, head)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", (q * head ** -0.5).astype(dtype), k.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    if mask is not None:
        logits = logits + mask[:, None].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, Lq, D).astype(dtype)
    return L.dense(out, p["out_proj_w"], p["out_proj_b"], dtype)


def _masked_block(x, p, num_heads, mask, act, dtype):
    """Pre-LN residual block with a per-sample additive mask."""
    xn = L.layer_norm(x, p["ln_1_scale"], p["ln_1_bias"])
    x = x + _masked_mha(xn, xn, p, num_heads, mask, dtype)
    x = x + L.mlp(L.layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p, act, dtype)
    return x


def _cross_block(x, kv, p, num_heads, act, dtype):
    """Cross-attention block (reference ResidualAttentionBlock with
    is_cross_attention=True, transformer.py:196-243): ln_1 on queries,
    ln_1_kv on the image tokens, no mask."""
    qn = L.layer_norm(x, p["ln_1_scale"], p["ln_1_bias"])
    kvn = L.layer_norm(kv, p["ln_1_kv_scale"], p["ln_1_kv_bias"])
    x = x + _masked_mha(qn, kvn, p, num_heads, None, dtype)
    x = x + L.mlp(L.layer_norm(x, p["ln_2_scale"], p["ln_2_bias"]), p, act, dtype)
    return x


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _block_params(k, L_, D, mlp_width, attn_std, proj_std, fc_std, cross=False):
    p = {
        "ln_1_scale": jnp.ones((L_, D)), "ln_1_bias": jnp.zeros((L_, D)),
        "in_proj_w": jax.random.normal(next(k), (L_, D, 3 * D)) * attn_std,
        "in_proj_b": jnp.zeros((L_, 3 * D)),
        "out_proj_w": jax.random.normal(next(k), (L_, D, D)) * proj_std,
        "out_proj_b": jnp.zeros((L_, D)),
        "ln_2_scale": jnp.ones((L_, D)), "ln_2_bias": jnp.zeros((L_, D)),
        "c_fc_w": jax.random.normal(next(k), (L_, D, mlp_width)) * fc_std,
        "c_fc_b": jnp.zeros((L_, mlp_width)),
        "c_proj_w": jax.random.normal(next(k), (L_, mlp_width, D)) * proj_std,
        "c_proj_b": jnp.zeros((L_, D)),
    }
    if cross:
        p["ln_1_kv_scale"] = jnp.ones((L_, D))
        p["ln_1_kv_bias"] = jnp.zeros((L_, D))
    return p


def init_coca_params(rng: jax.Array, cfg: CoCaConfig) -> Params:
    from latteclip_tpu.models.hf_text import HFTextConfig, init_hf_text_params

    kv, kt, kd = jax.random.split(rng, 3)
    if isinstance(cfg.text, HFTextConfig):
        # HF text trunk inside CoCa (coca_roberta-*, reference
        # coca_model.py:97-103); no cls token — the HF tower pools itself
        text_params = init_hf_text_params(kt, cfg.text, cfg.embed_dim)
    else:
        text_params = text_mod.init_text_params(kt, cfg.text, cfg.embed_dim)
        D = cfg.text.width
        # embed_cls: one extra position (reference transformer.py:599-604)
        text_params["cls_emb"] = jax.random.normal(kt, (D,)) * 0.01
        text_params["pos_embed"] = (
            jax.random.normal(kt, (cfg.text.context_length + 1, D)) * 0.01
        )

    md = cfg.multimodal
    Dm = md.width
    attn_std = Dm ** -0.5
    proj_std = attn_std * (2 * md.layers) ** -0.5
    fc_std = (2 * Dm) ** -0.5
    keys = iter(jax.random.split(kd, 32))
    decoder = {
        "blocks": _block_params(keys, md.layers, Dm, int(Dm * md.mlp_ratio), attn_std, proj_std, fc_std),
        "cross": _block_params(keys, md.layers, Dm, int(Dm * md.mlp_ratio), attn_std, proj_std, fc_std, cross=True),
        "ln_final_scale": jnp.ones((Dm,)),
        "ln_final_bias": jnp.zeros((Dm,)),
        "text_projection": jax.random.normal(next(keys), (Dm, cfg.text.vocab_size)) * attn_std,
    }
    return {
        "visual": vit_mod.init_vit_params(kv, cfg.vision, cfg.embed_dim),
        "text": text_params,
        "text_decoder": decoder,
        "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def coca_text_forward(
    params: Params, cfg: TextConfig, tokens: jnp.ndarray,
    *, pad_id: int = 0, dtype=jnp.bfloat16, quick_gelu=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tokens [B, ctx] -> (pooled latent [B, E] f32, token embs [B, ctx, D]).

    embed_cls text tower (reference transformer.py:672-708): cls appended
    after the text, causal + pad mask, 'last' pooling, ln_final after pool.
    """
    act = L.quick_gelu if quick_gelu else L.gelu
    B, ctx = tokens.shape
    seq = ctx + 1
    x = params["token_embedding"][tokens].astype(dtype)
    cls = jnp.broadcast_to(params["cls_emb"].astype(dtype), (B, 1, x.shape[-1]))
    x = jnp.concatenate([x, cls], axis=1)
    x = x + params["pos_embed"][:seq].astype(dtype)

    # causal + the reference's exact build_cls_mask semantics
    # (transformer.py:663-670): the pad mask applies ONLY to the final (cls)
    # query row, and its key indexing is left-shifted by the F.pad — key 0
    # is always visible and key k is gated by tokens[:, k-1].
    i = jnp.arange(seq)[:, None]
    j = jnp.arange(seq)[None, :]
    causal = jnp.where(j > i, NEG_INF, 0.0).astype(jnp.float32)  # [seq, seq]
    cls_row_keys = jnp.concatenate(
        [jnp.ones((B, 1), bool), tokens != pad_id], axis=1
    )                                                            # [B, seq]
    cls_row = jnp.where(cls_row_keys, 0.0, NEG_INF).astype(jnp.float32)
    is_cls_query = (jnp.arange(seq) == seq - 1).astype(jnp.float32)[:, None]
    mask = causal[None] + is_cls_query[None] * cls_row[:, None, :]

    def body(carry, layer_params):
        return _masked_block(carry, layer_params, cfg.heads, mask, act, dtype), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    pooled, token_embs = x[:, -1], x[:, :-1]
    pooled = L.layer_norm(pooled, params["ln_final_scale"], params["ln_final_bias"])
    pooled = L.dense(pooled, params["text_projection"], None, dtype)
    return pooled.astype(jnp.float32), token_embs


def coca_decode(
    params: Params, cfg: TextConfig, token_embs: jnp.ndarray, image_embs: jnp.ndarray,
    *, dtype=jnp.bfloat16, quick_gelu=False,
) -> jnp.ndarray:
    """Multimodal decoder: (text token embs, image token embs) -> vocab logits."""
    act = L.quick_gelu if quick_gelu else L.gelu
    seq = token_embs.shape[1]
    i = jnp.arange(seq)[:, None]
    j = jnp.arange(seq)[None, :]
    causal = jnp.where(j > i, NEG_INF, 0.0).astype(jnp.float32)[None]
    x = token_embs.astype(dtype)
    kv = image_embs.astype(dtype)

    def body(carry, layer_params):
        self_p, cross_p = layer_params
        out = _masked_block(carry, self_p, cfg.heads, causal, act, dtype)
        out = _cross_block(out, kv, cross_p, cfg.heads, act, dtype)
        return out, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], params["cross"]))
    x = L.layer_norm(x, params["ln_final_scale"], params["ln_final_bias"])
    return L.dense(x, params["text_projection"], None, dtype).astype(jnp.float32)


def encode_text_tokens(
    params: Params, cfg: CoCaConfig, tokens: jnp.ndarray, *, dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Text tower dispatch: native cls-mask transformer or an HF trunk with
    ``output_tokens`` (reference ``self.text(text)`` returning
    (latent, token_embs) either way, coca_model.py:145)."""
    from latteclip_tpu.models.hf_text import HFTextConfig, hf_text_forward_tokens

    if isinstance(cfg.text, HFTextConfig):
        return hf_text_forward_tokens(params["text"], cfg.text, tokens, dtype=dtype)
    return coca_text_forward(
        params["text"], cfg.text, tokens,
        pad_id=cfg.pad_id, dtype=dtype, quick_gelu=cfg.quick_gelu,
    )


def _generation_pad_id(cfg: CoCaConfig) -> int:
    """Fill value for not-yet-generated positions in the fixed-shape decode.

    The native tower is causal, so any fill works; an HF trunk is
    BIDIRECTIONAL — future positions must be its own pad id so the
    attention mask hides them (the reference instead grows the sequence
    dynamically, coca_model.py:268-283, which torch can afford)."""
    from latteclip_tpu.models.hf_text import HFTextConfig

    return cfg.text.pad_id if isinstance(cfg.text, HFTextConfig) else cfg.pad_id


def coca_forward(
    params: Params, cfg: CoCaConfig, images, tokens,
) -> Dict[str, jnp.ndarray]:
    """Full CoCa forward (reference coca_model.py:157-185)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    image_latent, image_embs = vit_mod.vit_forward(
        params["visual"], cfg.vision, images,
        dtype=dtype, quick_gelu=cfg.quick_gelu, output_tokens=True,
    )
    text_latent, token_embs = encode_text_tokens(params, cfg, tokens, dtype=dtype)
    logits = coca_decode(
        params["text_decoder"], cfg.multimodal, token_embs, image_embs,
        dtype=dtype, quick_gelu=cfg.quick_gelu,
    )
    return {
        "image_features": l2_normalize(image_latent),
        "text_features": l2_normalize(text_latent),
        "logits": logits,
        "labels": tokens[:, -logits.shape[1]:],
        "logit_scale": jnp.exp(params["logit_scale"]),
    }


def coca_loss(
    out: Dict[str, jnp.ndarray],
    *,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    pad_id: int = 0,
) -> Dict[str, jnp.ndarray]:
    """CoCaLoss (reference loss.py:278-321): weighted contrastive + caption
    CE with pad positions ignored."""
    contrastive = jnp.zeros(())
    if clip_loss_weight:
        contrastive = clip_loss_weight * clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"]
        )
    logits = out["logits"].astype(jnp.float32)
    labels = out["labels"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != pad_id).astype(jnp.float32)
    caption = -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return {
        "contrastive_loss": contrastive,
        "caption_loss": caption_loss_weight * caption,
    }


def generate(
    params: Params, cfg: CoCaConfig, images: jnp.ndarray,
    *, seq_len: int = 30, top_k: int = 1, temperature: float = 1.0,
    sot_token_id: int = 49406, eot_token_id: int = 49407,
    rng: Optional[jax.Array] = None, seed: int = 0,
) -> np.ndarray:
    """Greedy / top-k caption sampling with one fixed-shape compiled step.

    Tokens beyond the current position are pad; causality + the pad mask
    make them invisible, so a single [B, ctx] decode compiles once.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    B = images.shape[0]
    ctx = cfg.text.context_length
    rng = rng if rng is not None else jax.random.PRNGKey(seed)

    image_latent, image_embs = tpu_jit(
        lambda p, x: vit_mod.vit_forward(
            p["visual"], cfg.vision, x, dtype=dtype,
            quick_gelu=cfg.quick_gelu, output_tokens=True,
        )
    )(params, images)

    @tpu_jit
    def step_logits(p, tokens):
        _latent, token_embs = encode_text_tokens({"text": p["text"]}, cfg, tokens,
                                                 dtype=dtype)
        return coca_decode(p["text_decoder"], cfg.multimodal, token_embs, image_embs,
                           dtype=dtype, quick_gelu=cfg.quick_gelu)

    tokens = np.full((B, ctx), _generation_pad_id(cfg), dtype=np.int32)
    tokens[:, 0] = sot_token_id
    done = np.zeros(B, dtype=bool)
    for pos in range(1, min(seq_len, ctx)):
        logits = np.asarray(step_logits(params, jnp.asarray(tokens)))[:, pos - 1]
        if top_k <= 1:
            nxt = logits.argmax(axis=-1)
        else:
            rng, sub = jax.random.split(rng)
            vals, idx = jax.lax.top_k(jnp.asarray(logits) / temperature, top_k)
            choice = jax.random.categorical(sub, vals, axis=-1)
            nxt = np.asarray(jnp.take_along_axis(idx, choice[:, None], axis=1))[:, 0]
        nxt = np.where(done, cfg.pad_id, nxt)
        tokens[:, pos] = nxt
        done |= nxt == eot_token_id
        if done.all():
            break
    return tokens


def generate_beamsearch(
    params: Params, cfg: CoCaConfig, images: jnp.ndarray,
    *, num_beams: int = 6, num_beam_groups: int = 3, min_seq_len: int = 5,
    seq_len: int = 30, sot_token_id: int = 49406, eot_token_id: int = 49407,
) -> np.ndarray:
    """Grouped beam search (reference ``_generate_beamsearch``,
    coca_model.py:310-448, which drives HF's ``BeamSearchScorer``).

    Semantics mirrored: beams split into ``num_beam_groups`` groups of
    ``num_beams // num_beam_groups``; within a group the first beam starts
    at score 0 and the rest at -1e9 (groups decorrelate through their
    running scores); per step each group takes top ``2*group_size``
    candidates over ``group_size * vocab``, finished (EOT) candidates are
    banked and non-finished ones continue; EOT is masked while the sequence
    is shorter than ``min_seq_len`` (MinLengthLogitsProcessor); final
    hypothesis score is ``sum_logprob / len`` (HF length_penalty=1.0).

    The decode itself is the same fixed-shape jitted step as :func:`generate`
    — beams ride the batch axis, so one compilation serves every step.
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    B = images.shape[0]
    ctx = cfg.text.context_length
    sub = num_beams // num_beam_groups
    assert sub * num_beam_groups == num_beams, "num_beam_groups must divide num_beams"

    # beams ride the batch axis: encode each image once, repeat its tokens
    _latent, image_embs = tpu_jit(
        lambda p, x: vit_mod.vit_forward(
            p["visual"], cfg.vision, x, dtype=dtype,
            quick_gelu=cfg.quick_gelu, output_tokens=True,
        )
    )(params, images)
    image_embs = jnp.repeat(image_embs, num_beams, axis=0)

    @tpu_jit
    def step_logits(p, tokens):
        _lat, token_embs = encode_text_tokens({"text": p["text"]}, cfg, tokens,
                                              dtype=dtype)
        return coca_decode(p["text_decoder"], cfg.multimodal, token_embs, image_embs,
                           dtype=dtype, quick_gelu=cfg.quick_gelu)

    BB = B * num_beams
    tokens = np.full((BB, ctx), _generation_pad_id(cfg), dtype=np.int32)
    tokens[:, 0] = sot_token_id
    beam_scores = np.full((B, num_beams), -1e9, dtype=np.float64)
    beam_scores[:, ::sub] = 0.0
    beam_scores = beam_scores.reshape(BB)
    # banked hypotheses per (batch, group): list of (avg_score, token_row)
    hyps = [[[] for _ in range(num_beam_groups)] for _ in range(B)]

    max_pos = min(seq_len, ctx)
    for pos in range(1, max_pos):
        logits = np.asarray(step_logits(params, jnp.asarray(tokens)))[:, pos - 1]
        logits = logits.astype(np.float64)
        # stable log-softmax
        m = logits.max(-1, keepdims=True)
        logp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
        if pos < min_seq_len:  # MinLengthLogitsProcessor
            logp[:, eot_token_id] = -np.inf
        V = logp.shape[-1]

        new_tokens = tokens.copy()
        for b in range(B):
            for gidx in range(num_beam_groups):
                rows = [b * num_beams + gidx * sub + s for s in range(sub)]
                scores = logp[rows] + beam_scores[rows][:, None]   # [sub, V]
                flat = scores.reshape(-1)
                top = np.argsort(flat)[::-1][: 2 * sub]
                kept = 0
                for rank, cand in enumerate(top):
                    beam_i, tok = divmod(int(cand), V)
                    src = rows[beam_i]
                    cand_score = flat[cand]
                    if tok == eot_token_id:
                        # HF BeamSearchScorer.process: EOS candidates ranked
                        # below the top group_size never bank; banking
                        # replaces the WORST hypothesis when full (a later,
                        # better finish must not be discarded); score is
                        # sum_logprobs / len with EOS excluded (len == pos)
                        if rank >= sub:
                            continue
                        seq = tokens[src].copy()
                        seq[pos] = eot_token_id
                        entry = (cand_score / pos, seq)
                        bank = hyps[b][gidx]
                        if len(bank) < sub:
                            bank.append(entry)
                        else:
                            worst = min(range(len(bank)), key=lambda i: bank[i][0])
                            if entry[0] > bank[worst][0]:
                                bank[worst] = entry
                        continue
                    if kept < sub:
                        dst = rows[kept]
                        new_tokens[dst] = tokens[src]
                        new_tokens[dst, pos] = tok
                        beam_scores[dst] = cand_score
                        kept += 1
        tokens = new_tokens
        if all(len(g) >= sub for bh in hyps for g in bh):
            break

    out = np.full((B, ctx), cfg.pad_id, dtype=np.int32)
    for b in range(B):
        pool = [h for g in hyps[b] for h in g]
        for gidx in range(num_beam_groups):
            if len(hyps[b][gidx]) < sub:
                # HF finalize: groups that never filled their bank contribute
                # their running beams at final length
                for s in range(sub):
                    row = b * num_beams + gidx * sub + s
                    pool.append((beam_scores[row] / max_pos, tokens[row]))
        best = max(pool, key=lambda t: t[0])
        out[b] = best[1]
    return out
