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


class StepTraceProfiler:
    """Capture a ``jax.profiler`` device trace of a few warm train steps.

    The TPU-native counterpart of the reference's runtime tracing surface
    (``--trace`` / ``torch.jit.trace`` at ``src/open_clip/model.py:762-775``,
    ``--torchcompile`` at ``src/training/main.py:463-465``, and the
    FlopCounter profiling CLI at ``src/training/profiler.py:82-122``): one
    flag produces an XPlane trace (viewable in TensorBoard's profile plugin /
    xprof or Perfetto) covering ``[start_step, start_step + num_steps)`` of
    the run — after compile and pipeline warmup, so the trace shows
    steady-state kernels, not tracing/compilation.

    Drive it with :meth:`on_step` once per step index *before* dispatching
    that step; call :meth:`close` when the loop ends (idempotent — also stops
    an open trace if the run was shorter than ``start + num``). ``sync`` is a
    zero-arg callable that blocks until all dispatched device work finished;
    it is invoked before ``stop_trace`` so every traced step's device
    activity lands inside the capture window.
    """

    def __init__(self, trace_dir: str, start_step: int = 3, num_steps: int = 5):
        self.trace_dir = trace_dir
        self.start_step = max(int(start_step), 0)
        self.stop_step = self.start_step + max(int(num_steps), 1)
        self._active = False
        self._done = False

    def on_step(self, step: int, sync=None) -> None:
        if self._done:
            return
        if not self._active and step == self.start_step:
            import os

            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and step >= self.stop_step:
            self._stop(sync)

    def close(self, sync=None) -> None:
        if self._active:
            self._stop(sync)
        self._done = True

    def _stop(self, sync=None) -> None:
        if sync is not None:
            sync()
        jax.profiler.stop_trace()
        self._active = False
        self._done = True


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
