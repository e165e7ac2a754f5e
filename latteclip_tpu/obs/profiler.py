"""Model profiler: params + FLOPs per tower (reference ``profiler.py``).

Replaces the torch FlopCounter/fvcore CLI (reference
``src/training/profiler.py:82-246``) with XLA's own compiled-executable cost
analysis — the numbers come from the exact HLO that runs, not an op-by-op
estimate. Output: one CSV-ish line per model, matching the reference's
``model,image_size,image_width,text_width,embed_dim,gflops,mparams`` shape.

Usage:
    python -m latteclip_tpu.obs.profiler --model ViT-B-32 ViT-B-16 [--batch-size 1]
"""
from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _compiled_flops(fn, *args) -> Optional[float]:
    try:
        from latteclip_tpu.core.mesh import tpu_compiler_options

        compiled = jax.jit(fn).lower(*args).compile(
            compiler_options=tpu_compiler_options())
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


def profile_model(name: str, batch_size: int = 1) -> Dict[str, float]:
    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models import clip as clip_mod

    cfg = get_model_config(name)
    params = clip_mod.init_clip_params(jax.random.PRNGKey(0), cfg)

    images = jnp.zeros((batch_size, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32)
    tokens = jnp.zeros((batch_size, cfg.text.context_length), jnp.int32)

    image_flops = _compiled_flops(
        lambda p, x: clip_mod.encode_image(p, cfg, x, normalize=True), params, images
    )
    text_flops = _compiled_flops(
        lambda p, t: clip_mod.encode_text(p, cfg, t, normalize=True), params, tokens
    )
    out = {
        "model": name,
        "image_size": cfg.vision.image_size,
        "image_width": cfg.vision.width,
        "text_width": cfg.text.width,
        "embed_dim": cfg.embed_dim,
        "mparams": round(count_params(params) / 1e6, 2),
        "mparams_image": round(count_params(params["visual"]) / 1e6, 2),
        "mparams_text": round(count_params(params["text"]) / 1e6, 2),
    }
    if image_flops is not None:
        out["image_gflops"] = round(image_flops / batch_size / 1e9, 2)
    if text_flops is not None:
        out["text_gflops"] = round(text_flops / batch_size / 1e9, 2)
    if image_flops is not None and text_flops is not None:
        out["gflops"] = round((image_flops + text_flops) / batch_size / 1e9, 2)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--model", nargs="+", required=True)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args(argv)
    rows = [profile_model(m, args.batch_size) for m in args.model]
    cols = sorted({k for r in rows for k in r})
    cols = ["model"] + [c for c in cols if c != "model"]
    print(",".join(cols))
    for r in rows:
        print(",".join(str(r.get(c, "")) for c in cols))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
