"""Round-4 A/B: variable-length PACKED text tower vs padded / context-capped.

VERDICT r3 #3: round-3's naive block-diag packing (3x77 rows -> one [231]
kernel row) lost 11% for measured VPU reasons; TRUE variable-length packing
(real caption lengths, next-fit into [R, 128] rows, segment-masked kernel —
commit d747505) changes the arithmetic: the tower runs on ~sum(len) tokens
instead of N*77, and per-sequence padded score entries DROP (a 4-seq row
costs 128*128/4 = 4096 entries/seq vs 77*128-lane-pad = 9856 padded).

Two caption-length scenarios at the step's text shapes (N = 2*512 caption
sequences, ViT-B-16 text tower: width 512, 12 layers, value+grad, remat):

  longtail  — LLaVA-like lognormal (median ~30 BPE tokens) with a real tail
              to the full 77 context; --text-context-cap auto is pinned to
              77 here, so packing is the ONLY lever.
  cap48     — the same distribution clipped at 48 (the VERDICT's named
              comparison point); packing vs the ctx-48 padded tower.

Reference semantics: pad-to-77 tokenizer
(/root/reference/src/open_clip/tokenizer.py:250-258).

Usage: python tools/r4_packed_bench.py    (run ALONE — chip claim exclusive)
"""
from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def caption_lengths(rng, n, clip_max):
    """LLaVA-caption-like BPE length distribution (SOT+EOT included)."""
    ln = rng.lognormal(mean=np.log(30.0), sigma=0.35, size=n)
    return np.clip(np.round(ln).astype(np.int64) + 2, 8, clip_max)


def token_rows(rng, lengths, ctx=77):
    """Padded-to-ctx rows with ascending-safe EOT (highest id at len-1)."""
    n = len(lengths)
    toks = np.zeros((n, ctx), np.int32)
    for i, ln in enumerate(lengths):
        toks[i, 0] = 49406                      # SOT
        toks[i, 1:ln - 1] = rng.integers(1, 49000, size=ln - 2)
        toks[i, ln - 1] = 49407                 # EOT (argmax pool target)
    return toks


def main():
    import jax
    import jax.numpy as jnp

    from perf_lab import timeit

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.data.packing import pack_rows_needed, pack_token_rows
    from latteclip_tpu.models.text import init_text_params, text_forward, text_forward_packed

    cfg = get_model_config("ViT-B-16").text
    params = init_text_params(jax.random.PRNGKey(0), cfg, embed_dim=512)
    rng = np.random.default_rng(0)
    N, PACK = 1024, 128

    for name, clip_max in (("longtail", 77), ("cap48", 48)):
        lengths = caption_lengths(rng, N, clip_max)
        toks = token_rows(rng, lengths, ctx=77)
        cap = int(lengths.max())                # --text-context-cap auto
        need = pack_rows_needed(lengths, PACK)
        rows = need + 2                         # dataset-level static slack
        packed = pack_token_rows(toks, lengths, PACK, rows=rows)
        print(f"\n== {name}: N={N} mean_len={lengths.mean():.1f} max={cap} "
              f"packed_rows={rows} (token slots: 77-pad {N*77}, cap {N*cap}, "
              f"packed {rows*PACK})", flush=True)

        toks_d = jax.device_put(jnp.asarray(toks))
        cap_d = jax.device_put(jnp.asarray(toks[:, :cap]))
        pk = [jax.device_put(jnp.asarray(a)) for a in
              (packed.tokens, packed.positions, packed.seg_ids,
               packed.eot_row, packed.eot_col)]

        # bf16 value equivalence at real size before timing anything
        ref = np.asarray(text_forward(params, cfg, toks_d))
        got = np.asarray(text_forward_packed(params, cfg, *pk))
        print(f"   bf16 packed-vs-padded max|diff| = {np.abs(ref - got).max():.4f}",
              flush=True)

        variants = {
            f"padded ctx77": jax.jit(lambda p: jax.grad(lambda q: jnp.sum(
                text_forward(q, cfg, toks_d, remat=True)))(p)["ln_final_scale"]),
            f"padded ctx{cap} (cap auto)": jax.jit(lambda p: jax.grad(lambda q: jnp.sum(
                text_forward(q, cfg, cap_d, remat=True)))(p)["ln_final_scale"]),
            f"packed [{rows},{PACK}]": jax.jit(lambda p: jax.grad(lambda q: jnp.sum(
                text_forward_packed(q, cfg, *pk, remat=True)))(p)["ln_final_scale"]),
        }
        base = None
        for vn, f in variants.items():
            t = timeit(f, params, iters=5)
            if base is None:
                base = t
            print(f"   {vn:28s}: {t*1e3:8.2f} ms  ({base/t:5.2f}x vs ctx77)",
                  flush=True)


if __name__ == "__main__":
    main()
