"""Round-5 decomposition of the PACKED train step (VERDICT r4 #1/#2).

All prior step decomposition (attention-free bound, tower splits — BASELINE.md
2026-08-18 rows) was done on the *padded B/16* step; packing changed the
arithmetic. This tool re-runs the same methodology on the packed step at both
configs, in ONE process so every number is same-session comparable:

  base        packed step (B/32 and/or B/16), bs512 + per-block remat
  attnfree    same step with BOTH attention kernels stubbed to v-passthrough
              (wrong numerics, same shapes + grad path) — bounds what ANY
              attention work costs / any kernel optimization can buy
  noaug       packed step without in-step augmentation
  noopt       packed fwd+bwd only (no AdamW update / bank update / metrics) —
              isolates optimizer + bank + fusion epilogue cost
  towers      vision value+grad and PACKED caption-tower value+grad at step
              shapes (the subtraction terms)
  trace       jax.profiler trace of 3 warm packed steps + a chrome-trace op
              breakdown (top ops by device time)

Usage: python tools/r5_decomp.py [probe ...] [--model ViT-B-32]
Run ALONE — the chip claim is exclusive; concurrent CPU work distorts it.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import bench  # noqa: E402  (repo-root bench.py: batch maker + packing recipe)

PACK = 128


def _build(model: str, batch: int = 512, remat: bool = True, packing: int = PACK,
           augment: bool = True, update: bool = True):
    """Step + device batch, mirroring bench.run's packed setup exactly."""
    import jax

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.core.mesh import tpu_compiler_options
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import (
        build_template_table,
        create_train_state,
        init_memory_bank,
    )
    from latteclip_tpu.train.step import LatteHParams, make_train_step

    cfg = get_model_config(model)
    classes = [f"class {i}" for i in range(47)]
    templates = [lambda c: f"{c} texture."]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    hp = LatteHParams(remat=remat, text_packing=bool(packing), augment=augment)

    template_packed = None
    if packing:
        from latteclip_tpu.data.packing import pack_template_table

        template_packed = pack_template_table(np.asarray(table), packing)
    raw = bench.make_batch(batch, cfg.vision.image_size, len(classes),
                           eot_id=tokenizer.eot_token_id, longtail=bool(packing))
    if packing:
        from latteclip_tpu.data.packing import (
            pack_caption_batch,
            pack_rows_needed,
            token_lengths,
        )

        lens = np.concatenate([token_lengths(raw["per_image_tokens"]),
                               token_lengths(raw["per_group_tokens"])])
        need = pack_rows_needed(lens, packing)
        rows = -(-(need + max(2, need // 16)) // 8) * 8
        raw.update(pack_caption_batch(raw["per_image_tokens"],
                                      raw["per_group_tokens"], packing, rows))
    step_fn = make_train_step(cfg, optimizer, hp, table,
                              template_packed=template_packed)
    if not update:
        # fwd+bwd only: same augment + loss graph, grads reduced to a scalar;
        # no optimizer/bank epilogue — the step-minus-this gap is epilogue
        import jax.numpy as jnp

        from latteclip_tpu.data import transforms as T
        from latteclip_tpu.train import step as step_mod

        table_j = jnp.asarray(table)
        tpl_j = (tuple(jnp.asarray(a) for a in template_packed)
                 if template_packed is not None else None)

        def grads_only(state, db, rng):
            mean, std = T.model_mean_std(cfg)
            images = (T.train_augment_normalize(
                db["images"], rng, T.AugConfig(), mean=mean, std=std,
                size=cfg.vision.image_size)
                if augment else T.normalize_images(db["images"], mean=mean, std=std))
            (loss, _aux), grads = jax.value_and_grad(
                step_mod.latteclip_loss_fn, has_aux=True)(
                state.params, cfg, hp, db, images,
                state.memory_bank, state.prototypes, table_j, tpl_j)
            gsum = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree.leaves(grads))
            return state, {"loss": loss + 0.0 * gsum}

        step_fn = grads_only
    step = jax.jit(step_fn, donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())
    device_batch = {k: jax.device_put(v) for k, v in raw.items()}
    return state, step, device_batch


def time_step(tag: str, model: str, iters: int = 10, batch: int = 512, **kw) -> float:
    import jax

    state, step, db = _build(model, batch=batch, **kw)
    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(i))
    float(m["loss"])  # relay: block_until_ready is a no-op; sync via readback
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:28s}: {dt*1e3:8.1f} ms  {batch/dt:8.1f} img/s", flush=True)
    return dt


def _stub_attention():
    """v-passthrough both kernels (shape/dtype/grad-path preserved).

    WARNING: module-global patch — it poisons every probe that runs AFTER
    attnfree in the same process (the round-5 first run did exactly that:
    its noaug/noopt/trace numbers were attention-free). Probes now restore
    the real kernels on entry via _unstub_attention().
    """
    from latteclip_tpu.kernels import attention as A

    _save_real_attention()

    def stub(qkv, num_heads, causal=False):
        hd = qkv.shape[-1] // 3
        return qkv[..., 2 * hd:]

    def stub_seg(qkv, num_heads, seg_ids, causal=True):
        hd = qkv.shape[-1] // 3
        return qkv[..., 2 * hd:]

    A.flash_attention_qkv = stub
    A.flash_attention_qkv_segmented = stub_seg


_REAL_ATTN = {}


def _save_real_attention():
    from latteclip_tpu.kernels import attention as A

    if not _REAL_ATTN:
        _REAL_ATTN["qkv"] = A.flash_attention_qkv
        _REAL_ATTN["seg"] = A.flash_attention_qkv_segmented


def _unstub_attention():
    from latteclip_tpu.kernels import attention as A

    if _REAL_ATTN:
        A.flash_attention_qkv = _REAL_ATTN["qkv"]
        A.flash_attention_qkv_segmented = _REAL_ATTN["seg"]


BATCH = 512   # overridable via --batch (round-5 tuned config: 384)
REMAT = True  # overridable via --no-remat


def probe_base(model):
    time_step("base packed", model, packing=PACK, batch=BATCH, remat=REMAT)


def probe_attnfree(model):
    _stub_attention()
    time_step("attn-free packed", model, packing=PACK, batch=BATCH, remat=REMAT)


def probe_noaug(model):
    time_step("no-aug packed", model, packing=PACK, augment=False,
              batch=BATCH, remat=REMAT)


def probe_noopt(model):
    time_step("fwd+bwd only (no opt)", model, packing=PACK, update=False,
              batch=BATCH, remat=REMAT)


def probe_padded(model):
    time_step("base padded", model, packing=0, batch=BATCH, remat=REMAT)


def probe_towers(model):
    """Tower-isolated value+grad at the packed step's real shapes."""
    import jax
    import jax.numpy as jnp

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.core.mesh import tpu_jit
    from latteclip_tpu.data.packing import (
        pack_caption_batch,
        pack_rows_needed,
        token_lengths,
    )
    from latteclip_tpu.models import clip as clip_mod
    from latteclip_tpu.models.clip import init_clip_params
    from perf_lab import timeit

    batch = 512
    cfg = get_model_config(model)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.standard_normal(
        (batch, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))

    # images must be an ARGUMENT: a closed-over device array becomes a jaxpr
    # constant and the 300 MB compile request dies with HTTP 413 on the relay
    f = tpu_jit(jax.grad(lambda p, im: jnp.sum(
        clip_mod.encode_image(p, cfg, im, normalize=True, remat=True).astype(jnp.float32))))
    t = timeit(lambda p: f(p, imgs)["logit_scale"], params, iters=5)
    print(f"vision grad bs{batch} remat   : {t*1e3:8.1f} ms", flush=True)

    raw = bench.make_batch(batch, cfg.vision.image_size, 47, eot_id=49407, longtail=True)
    lens = np.concatenate([token_lengths(raw["per_image_tokens"]),
                           token_lengths(raw["per_group_tokens"])])
    need = pack_rows_needed(lens, PACK)
    rows = -(-(need + max(2, need // 16)) // 8) * 8
    pk = pack_caption_batch(raw["per_image_tokens"], raw["per_group_tokens"], PACK, rows)
    dev = {k: jax.device_put(v) for k, v in pk.items()}

    g = tpu_jit(jax.grad(lambda p: jnp.sum(clip_mod.encode_text_packed(
        p, cfg, dev["cap_tokens"], dev["cap_positions"], dev["cap_seg_ids"],
        dev["cap_eot_row"], dev["cap_eot_col"], normalize=True,
        remat=True).astype(jnp.float32))))
    t = timeit(lambda p: g(p)["logit_scale"], params, iters=5)
    print(f"packed text grad 2x{batch} [{rows},{PACK}]: {t*1e3:8.1f} ms", flush=True)


def probe_trace(model):
    """jax.profiler trace of 3 warm packed steps + chrome-trace op breakdown."""
    import jax

    state, step, db = _build(model, packing=PACK, batch=BATCH, remat=REMAT)
    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(i))
    float(m["loss"])
    trace_dir = f"/tmp/r5_trace_{model.replace('-', '')}_b{BATCH}_r{int(REMAT)}"
    jax.profiler.start_trace(trace_dir)
    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    jax.profiler.stop_trace()
    print(f"trace -> {trace_dir}", flush=True)
    report_trace(trace_dir)


def report_trace(trace_dir: str, top: int = 40) -> None:
    """Sum device-lane op durations in the newest trace.json.gz under dir."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace.json.gz found", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device; fall back to
    # every complete event if the metadata is absent
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if any(s in n for s in ("TPU", "Device", "device", "/device:"))}
    totals, counts = {}, {}
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        totals[name] = totals.get(name, 0.0) + dur
        counts[name] = counts.get(name, 0) + 1
        wall += dur
    print(f"device op time total: {wall/1e3:.1f} ms over {len(totals)} distinct ops")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur/1e3:9.2f} ms  x{counts[name]:4d}  {dur/max(wall,1e-9)*100:5.1f}%  {name[:110]}")


PROBES = {
    "base": probe_base,
    "padded": probe_padded,
    "attnfree": probe_attnfree,
    "noaug": probe_noaug,
    "noopt": probe_noopt,
    "towers": probe_towers,
    "trace": probe_trace,
}


def main():
    global BATCH, REMAT
    argv = sys.argv[1:]
    if "--batch" in argv:
        i = argv.index("--batch")
        BATCH = int(argv[i + 1])
        del argv[i:i + 2]
    if "--no-remat" in argv:
        REMAT = False
        argv.remove("--no-remat")
    model = "ViT-B-32"
    if "--model" in argv:
        i = argv.index("--model")
        model = argv[i + 1]
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    print(f"batch={BATCH} remat={REMAT}", flush=True)
    names = args or ["base", "attnfree", "noaug", "noopt", "towers", "trace"]
    print(f"model={model}", flush=True)
    for n in names:
        print(f"=== {n} ===", flush=True)
        t0 = time.time()
        _unstub_attention()  # attnfree patches module-globally; isolate probes
        try:
            PROBES[n](model)
        except Exception as e:
            print(f"{n} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
        print(f"=== {n} done in {time.time()-t0:.0f}s ===", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
