"""Round-5: locate the wall-vs-device gap of the packed train step.

The r5_decomp trace (BASELINE.md 2026-08-19) shows the packed ViT-B-32 step
busy on-device for 247 ms while the pipelined wall clock reads 315 ms/step —
a ~68 ms/step gap that matches the near-identical wall deltas of the noaug /
noopt ablations. Hypothesis: fixed per-execute dispatch overhead through the
remote-TPU path, not device compute. Probes (one process, same session):

  tiny     100 pipelined calls of a trivial jitted fn -> raw per-dispatch cost
  base     10 pipelined packed steps (reproduces bench.run's methodology)
  serial   10 steps with a scalar readback after each -> full RTT per step
  megaK    ONE jitted lax.scan over K packed steps (K optimizer updates on
           the same resident batch, distinct rng per step) -> if wall/K drops
           to ~device+overhead/K the gap is dispatch, and scan-of-steps is
           the production fix (train loop dispatches once per K batches)

Usage: python tools/r5_dispatch.py [tiny base serial mega4 ...]
Run ALONE on the chip (concurrent CPU work distorts relay timing).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

from r5_decomp import _build, PACK  # noqa: E402


def probe_tiny(model):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.float32(0.0))
    for _ in range(3):
        x = f(x)
    float(x)
    t0 = time.perf_counter()
    for _ in range(100):
        x = f(x)
    float(x)
    dt = (time.perf_counter() - t0) / 100
    print(f"tiny pipelined dispatch      : {dt*1e3:8.2f} ms/call", flush=True)


def _timed(tag, state, step, db, iters=10, serial=False, batch=512):
    import jax

    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
        if serial:
            float(m["loss"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:28s}: {dt*1e3:8.1f} ms  {batch/dt:8.1f} img/s", flush=True)
    return dt


def probe_base(model):
    state, step, db = _build(model, packing=PACK)
    _timed("base packed (pipelined)", state, step, db)


def probe_serial(model):
    state, step, db = _build(model, packing=PACK)
    _timed("base packed (serial sync)", state, step, db, serial=True)


def probe_mega(model, k: int):
    import jax

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.core.mesh import tpu_compiler_options
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    # rebuild the raw (unjitted) step so we can scan it
    import bench
    import jax.numpy as jnp

    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )

    cfg = get_model_config(model)
    classes = [f"class {i}" for i in range(47)]
    templates = [lambda c: f"{c} texture."]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    hp = LatteHParams(remat=True, text_packing=True)
    from latteclip_tpu.data.packing import (
        pack_caption_batch,
        pack_rows_needed,
        pack_template_table,
        token_lengths,
    )

    template_packed = pack_template_table(np.asarray(table), PACK)
    raw = bench.make_batch(512, cfg.vision.image_size, len(classes),
                           eot_id=tokenizer.eot_token_id, longtail=True)
    lens = np.concatenate([token_lengths(raw["per_image_tokens"]),
                           token_lengths(raw["per_group_tokens"])])
    need = pack_rows_needed(lens, PACK)
    rows = -(-(need + max(2, need // 16)) // 8) * 8
    raw.update(pack_caption_batch(raw["per_image_tokens"],
                                  raw["per_group_tokens"], PACK, rows))
    step_fn = make_train_step(cfg, optimizer, hp, table,
                              template_packed=template_packed)
    db = {kk: jax.device_put(v) for kk, v in raw.items()}

    def mega(st, batch, rng):
        keys = jax.random.split(rng, k)

        def body(s, key):
            s, m = step_fn(s, batch, key)
            return s, m["loss"]

        st, losses = jax.lax.scan(body, st, keys)
        return st, {"loss": losses[-1]}

    step = jax.jit(mega, donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())
    dt = _timed(f"mega{k} packed (scan of {k})", state, step, db,
                iters=max(3, 12 // k), batch=512)
    print(f"  -> per inner step: {dt/k*1e3:8.1f} ms  {512*k/dt:8.1f} img/s",
          flush=True)


def probe_upload(model):
    """Raw H2D bandwidth + whether uploads overlap compute (full-loop bound).

    The full training loop ships ~154 MB of uint8 canvases per bs256 batch
    (448px on-device-resize path); BASELINE.md's 779 img/s steady state is
    exactly what a SERIALIZED upload+step would give. Three timings:
      put       repeated device_put of a fresh 154 MB uint8 buffer
      step      device-resident-batch step (the bench number, for reference)
      put+step  alternate fresh-upload and step like the real loop -> if this
                is ~max(put, step) the relay overlaps; ~put+step it serializes
    """
    import jax

    state, step, db = _build(model, batch=256, packing=PACK)
    buf = np.random.default_rng(0).integers(
        0, 255, (256, 448, 448, 3), dtype=np.uint8)
    for i in range(2):
        state, m = step(state, db, jax.random.PRNGKey(i))
    x = jax.device_put(buf)
    float(m["loss"]); np.asarray(x[0, 0, 0, 0])
    t0 = time.perf_counter()
    for i in range(10):
        x = jax.device_put(buf)
    np.asarray(x[0, 0, 0, 0])
    dt_put = (time.perf_counter() - t0) / 10
    print(f"device_put 154MB             : {dt_put*1e3:8.1f} ms  "
          f"{buf.nbytes/dt_put/1e9:6.2f} GB/s", flush=True)

    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt_step = (time.perf_counter() - t0) / 10
    print(f"step bs256 resident          : {dt_step*1e3:8.1f} ms", flush=True)

    t0 = time.perf_counter()
    for i in range(10):
        x = jax.device_put(buf)
        state, m = step(state, db, jax.random.PRNGKey(200 + i))
    float(m["loss"]); np.asarray(x[0, 0, 0, 0])
    dt_both = (time.perf_counter() - t0) / 10
    overlap = "OVERLAPS" if dt_both < 0.75 * (dt_put + dt_step) else "SERIALIZES"
    print(f"put+step alternating         : {dt_both*1e3:8.1f} ms  -> {overlap} "
          f"(serial would be {(dt_put+dt_step)*1e3:.1f})", flush=True)


PROBES = {
    "tiny": probe_tiny,
    "base": probe_base,
    "serial": probe_serial,
    "upload": probe_upload,
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    model = "ViT-B-32"
    if "--model" in sys.argv:
        model = sys.argv[sys.argv.index("--model") + 1]
    names = args or ["tiny", "base", "serial", "mega4"]
    print(f"model={model}", flush=True)
    for n in names:
        print(f"=== {n} ===", flush=True)
        t0 = time.time()
        try:
            if n.startswith("mega"):
                probe_mega(model, int(n[4:]))
            else:
                PROBES[n](model)
        except Exception as e:
            print(f"{n} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        print(f"=== {n} done in {time.time()-t0:.0f}s ===", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
