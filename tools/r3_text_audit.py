"""Round-3 text-tower audit: where do the caption streams' ~284 ms go?

The fused v2 step spends ~284 ms encoding 2B captions + C templates
(BASELINE.md: full 902 ms - FLYP 683 ms); at ~24 TF of work that is only
~85 TF/s while bare GEMMs on this chip reach 196 TF/s. This tool breaks the
text tower (ViT-B-16 text: D=512, 12 layers, H=8, L=77) into slices so the
slow part is attributable:

  A  full text grad, remat ON  (production config)
  B  full text grad, remat OFF (isolates the remat recompute tax)
  C  attention-free tower grad (GEMM+LN only; attention -> v passthrough)
  D  flash attention alone at [T, 77, 8, 64], fwd and fwd+bwd
  E  bare GEMM chain at the exact text shapes

Usage: python tools/r3_text_audit.py [batch]   (default 1071 = 2*512 + 47)
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "tools")
from perf_lab import timeit, timeit_looped  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models import clip as clip_mod
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models import layers
    from latteclip_tpu.kernels.fused_ln_linear import ln_linear

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * 512 + 47
    cfg = get_model_config("ViT-B-16")
    tc = cfg.text
    D, L, H, ctx = tc.width, tc.layers, tc.heads, tc.context_length
    M = int(D * tc.mlp_ratio)
    hd = D // H
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    toks = jax.device_put(rng.integers(1, 49406, size=(B, ctx)).astype(np.int32))
    T = B * ctx

    gemm_f = T * (2 * D * 3 * D + 2 * D * D + 2 * 2 * D * M) * L
    attn_f = 4 * B * H * ctx * ctx * hd * L
    fwd_f = gemm_f + attn_f
    print(f"B={B} T={T}: fwd GEMM {gemm_f/1e12:.2f} TF + attn {attn_f/1e12:.2f} TF",
          flush=True)

    def run(tag, f, flops, iters=8):
        try:
            t = timeit(f, params, iters=iters)
            print(f"{tag:34s}: {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            print(f"{tag:34s}: FAILED {str(e)[:140]}", flush=True)
            return None

    # A/B: full text tower value+grad (sum-of-squares loss, grad wrt params)
    for remat in (True, False):
        f = jax.jit(jax.grad(lambda p: jnp.sum(
            clip_mod.encode_text(p, cfg, toks, normalize=True, remat=remat
                                 ).astype(jnp.float32) ** 2)))
        g = lambda p: f(p)["text"]["ln_final_scale"]  # noqa: E731
        # remat: fwd + bwd(2x) + fwd-recompute(~0.9x GEMM); no-remat: 3x
        mult = 3.9 if remat else 3.0
        run(f"A/B full text grad remat={remat}", g, mult * fwd_f)

    # C: attention-free tower (same params/LN/GEMMs, attention -> v slice)
    def noattn_forward(p, remat):
        x = p["text"]["token_embedding"][toks].astype(jnp.bfloat16)
        x = x + p["text"]["pos_embed"][:ctx].astype(jnp.bfloat16)

        def body(carry, lp):
            qkv = ln_linear(carry, lp["ln_1_scale"], lp["ln_1_bias"],
                            lp["in_proj_w"], lp["in_proj_b"], jnp.bfloat16)
            attn = qkv[..., 2 * D:]  # v passthrough, no kernel
            attn = layers.dense(attn, lp["out_proj_w"], lp["out_proj_b"], jnp.bfloat16)
            x2 = carry + attn
            h = ln_linear(x2, lp["ln_2_scale"], lp["ln_2_bias"],
                          lp["c_fc_w"], lp["c_fc_b"], jnp.bfloat16)
            h = layers.dense(layers.gelu(h), lp["c_proj_w"], lp["c_proj_b"], jnp.bfloat16)
            return x2 + h, None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, p["text"]["blocks"])
        x = layers.layer_norm(x, p["text"]["ln_final_scale"], p["text"]["ln_final_bias"])
        pooled = jnp.take_along_axis(x, toks.argmax(-1)[:, None, None], axis=1)[:, 0]
        return layers.dense(pooled, p["text"]["text_projection"], None, jnp.bfloat16)

    for remat in (True, False):
        f = jax.jit(jax.grad(lambda p: jnp.sum(
            noattn_forward(p, remat).astype(jnp.float32) ** 2)))
        g = lambda p: f(p)["text"]["ln_final_scale"]  # noqa: E731
        mult = 3.9 if remat else 3.0
        run(f"C  no-attn tower grad remat={remat}", g, mult * gemm_f)

    # D: flash attention alone at the text shape
    from latteclip_tpu.kernels.attention import flash_attention_qkv

    qkv = jnp.asarray(rng.standard_normal((B, ctx, 3 * D)), dtype=jnp.bfloat16)
    af = attn_f / L  # one layer's worth
    t = timeit_looped(lambda x: flash_attention_qkv(x, H, causal=True), (qkv,))
    print(f"{'D  flash attn L=77 fwd (1 layer)':34s}: {t*1e3:8.2f} ms  "
          f"{af/t/1e12:6.1f} TF/s -> x12 = {12*t*1e3:.1f} ms", flush=True)
    t = timeit_looped(jax.grad(lambda x: jnp.sum(
        flash_attention_qkv(x, H, causal=True).astype(jnp.float32))), (qkv,))
    print(f"{'D  flash attn L=77 fwd+bwd':34s}: {t*1e3:8.2f} ms  "
          f"{15/4*af/t/1e12:6.1f} TF/s -> x12 = {12*t*1e3:.1f} ms", flush=True)

    # E: bare GEMMs at text shapes (fwd only, one layer's worth)
    x = jnp.asarray(rng.standard_normal((T, D)), dtype=jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((D, 3 * D)), dtype=jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((D, M)), dtype=jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((M, D)), dtype=jnp.bfloat16)

    def chain(x, w1, w2, w3):
        a = (x @ w1)[:, :D]
        b = a @ w2
        return b @ w3

    gf = T * (2 * D * 3 * D + 2 * D * M + 2 * M * D)
    t = timeit_looped(chain, (x, w1, w2, w3))
    print(f"{'E  bare GEMM chain (1 layer-ish)':34s}: {t*1e3:8.2f} ms  "
          f"{gf/t/1e12:6.1f} TF/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
