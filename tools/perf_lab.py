"""Perf lab: on-TPU microbenchmarks for round-2 optimization work.

Not part of the library; a scratch harness to time kernels and step
components. Usage:
    python tools/perf_lab.py attn      # attention kernel variants
    python tools/perf_lab.py step      # full-step timing variants
    python tools/perf_lab.py gemm      # bare GEMM roofline check

Sync note: on the axon relay, block_until_ready does not block; every
timing loop chains work and syncs once via a scalar readback.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def _sync(x):
    import jax
    return float(jax.numpy.sum(x.astype(jax.numpy.float32)))


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.perf_counter() - t0) / iters


def timeit_looped(make_fn, args, iters=20):
    """Time fn by scanning `iters` applications INSIDE one jit — removes the
    per-dispatch relay overhead (~3ms/call) that poisons plain loops.

    make_fn(*args) -> array; the first arg is threaded as the scan carry
    (rescaled each iter so values don't blow up) to force sequential
    execution and defeat CSE.
    """
    import jax
    import jax.numpy as jnp

    def body(carry, _, rest):
        out = make_fn(carry, *rest)
        first = out[0] if isinstance(out, (tuple, list)) else out
        if first.shape == carry.shape:
            nxt = (first * 0.999).astype(carry.dtype)
        else:
            # Real elementwise data dependency on the output — a scalar dep
            # scaled tiny rounds to identity in bf16 and XLA then hoists the
            # op out of the loop entirely (observed: >peak "TF/s").
            flat = first.reshape(-1)
            n = carry.size
            reps = -(-n // flat.size)
            dep = jnp.tile(flat, reps)[:n].reshape(carry.shape)
            nxt = (carry * 0.999 + dep.astype(carry.dtype) * 1e-3).astype(carry.dtype)
        return nxt, ()

    @jax.jit
    def run(x0, *rest):
        import functools
        final, _ = jax.lax.scan(
            functools.partial(body, rest=rest), x0, None, length=iters
        )
        return jnp.sum(final.astype(jnp.float32))

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def bench_attention():
    import jax
    import jax.numpy as jnp

    from latteclip_tpu.kernels.attention import flash_attention_qkv
    from latteclip_tpu.kernels import xla_attention

    B, L, H, D = 512, 197, 12, 64
    HD = H * D
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, L, 3 * HD)), dtype=jnp.bfloat16)
    q, k, v = (jnp.asarray(np.asarray(qkv[..., i * HD:(i + 1) * HD])) for i in range(3))

    fwd_flops = 4 * B * H * L * L * D
    # value+grad: fwd (4) + bwd (11) units of B*H*L*L*D
    tot_flops = 15 * B * H * L * L * D

    t = timeit_looped(lambda qkv: flash_attention_qkv(qkv, H), (qkv,))
    print(f"pallas fwd          : {t*1e3:8.2f} ms  {fwd_flops/t/1e12:6.1f} TF/s")

    def loss_fa(qkv):
        return jnp.sum(flash_attention_qkv(qkv, H).astype(jnp.float32))

    t = timeit_looped(jax.grad(loss_fa), (qkv,))
    print(f"pallas fwd+bwd      : {t*1e3:8.2f} ms  {tot_flops/t/1e12:6.1f} TF/s")

    def xla_fa(q, k, v):
        o = xla_attention(
            q.reshape(B, L, H, D), k.reshape(B, L, H, D), v.reshape(B, L, H, D)
        )
        return o.reshape(B, L, HD)

    t = timeit_looped(xla_fa, (q, k, v))
    print(f"xla fwd             : {t*1e3:8.2f} ms  {fwd_flops/t/1e12:6.1f} TF/s")

    t = timeit_looped(jax.grad(lambda q, k, v: jnp.sum(xla_fa(q, k, v).astype(jnp.float32)), argnums=(0, 1, 2)), (q, k, v))
    print(f"xla fwd+bwd         : {t*1e3:8.2f} ms  {tot_flops/t/1e12:6.1f} TF/s")


def bench_gemm():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for (M, K, N, note) in [
        (512 * 197, 768, 2304, "qkv proj"),
        (512 * 197, 768, 768, "out proj"),
        (512 * 197, 768, 3072, "mlp fc"),
        (512 * 197, 3072, 768, "mlp proj"),
        (8192, 8192, 8192, "square roofline"),
    ]:
        a = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.bfloat16)
        t = timeit_looped(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16), (a, b))
        fl = 2 * M * K * N
        print(f"gemm {note:16s}: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")

    # attention-shaped batched dots, as XLA runs them
    for (G, L, D, note) in [(8, 197, 64, "qk^t G=8"), (96, 197, 64, "qk^t G=96")]:
        a = jnp.asarray(rng.standard_normal((G, L, D)), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((G, L, D)), dtype=jnp.bfloat16)
        dn = (((2,), (2,)), ((0,), (0,)))
        t = timeit_looped(lambda a, b: jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32), (a, b))
        fl = 2 * G * L * L * D
        print(f"batched {note:13s}: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TF/s")


def _make_step(model="ViT-B-16", remat=True, augment=True):
    import jax

    from latteclip_tpu.core.config import get_model_config
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
    hp = LatteHParams(remat=remat, augment=augment)
    from latteclip_tpu.core.mesh import tpu_compiler_options
    step = jax.jit(make_train_step(cfg, optimizer, hp, table), donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())
    return cfg, state, step


def bench_step(model="ViT-B-16", batch=512, remat=True, augment=True, iters=6):
    import jax

    cfg, state, step = _make_step(model, remat, augment)
    rng = np.random.default_rng(0)
    db = {
        "images": jax.device_put(rng.integers(0, 255, size=(batch, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.uint8)),
        "per_image_tokens": jax.device_put(rng.integers(1, 49406, size=(batch, 77)).astype(np.int32)),
        "per_group_tokens": jax.device_put(rng.integers(1, 49406, size=(batch, 77)).astype(np.int32)),
        "zs_preds": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
        "gt_labels": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
    }
    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"step {model} bs{batch} remat={remat} aug={augment}: {dt*1e3:8.1f} ms  {batch/dt:7.1f} img/s")
    return dt


def bench_flyp_step(model="ViT-B-16", batch=512, remat=True, iters=6):
    """FLYP baseline step: vision tower + C-template text only — subtracting
    from the full v2 step isolates the per-sample caption text-tower cost."""
    import jax

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models.clip import init_clip_params
    from latteclip_tpu.models.tokenizer import get_tokenizer
    from latteclip_tpu.train.optim import make_optimizer, make_schedule
    from latteclip_tpu.train.state import build_template_table, create_train_state, init_memory_bank
    from latteclip_tpu.train.step import LatteHParams, make_flyp_step

    cfg = get_model_config(model)
    classes = [f"class {i}" for i in range(47)]
    templates = [lambda c: f"{c} texture."]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tokenizer = get_tokenizer()
    bank = init_memory_bank(params, cfg, tokenizer, classes, templates)
    table = build_template_table(tokenizer, classes, templates)
    optimizer = make_optimizer(make_schedule("cosine", 1e-5, warmup=10, total_steps=1000))
    state = create_train_state(params, optimizer, bank)
    hp = LatteHParams(remat=remat)
    from latteclip_tpu.core.mesh import tpu_compiler_options
    step = jax.jit(make_flyp_step(cfg, optimizer, hp, table), donate_argnums=(0,),
                   compiler_options=tpu_compiler_options())

    rng = np.random.default_rng(0)
    db = {
        "images": jax.device_put(rng.integers(0, 255, size=(batch, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.uint8)),
        "zs_preds": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
        "gt_labels": jax.device_put(rng.integers(0, 47, size=(batch,)).astype(np.int32)),
    }
    for i in range(3):
        state, m = step(state, db, jax.random.PRNGKey(i))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, db, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"flyp step {model} bs{batch} remat={remat}: {dt*1e3:8.1f} ms  {batch/dt:7.1f} img/s")
    return dt


def bench_towers(model="ViT-B-16", batch=512):
    """Time vision-only and text-only value+grad at step shapes."""
    import jax
    import jax.numpy as jnp

    from latteclip_tpu.core.config import get_model_config
    from latteclip_tpu.models import clip as clip_mod
    from latteclip_tpu.models.clip import init_clip_params

    cfg = get_model_config(model)
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.standard_normal((batch, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32))
    toks = jax.device_put(rng.integers(1, 49406, size=(2 * batch, 77)).astype(np.int32))

    from latteclip_tpu.core.mesh import tpu_jit

    for remat in (True, False):
        try:
            f = tpu_jit(jax.grad(lambda p: jnp.sum(
                clip_mod.encode_image(p, cfg, imgs, normalize=True, remat=remat).astype(jnp.float32))))
            t = timeit(lambda p: f(p)["logit_scale"], params, iters=5)
            print(f"vision grad bs{batch} remat={remat}: {t*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"vision grad remat={remat}: FAILED {str(e)[:120]}", flush=True)
    for remat in (True, False):
        try:
            f = tpu_jit(jax.grad(lambda p: jnp.sum(
                clip_mod.encode_text(p, cfg, toks, normalize=True, remat=remat).astype(jnp.float32))))
            t = timeit(lambda p: f(p)["logit_scale"], params, iters=5)
            print(f"text  grad 2x{batch} remat={remat}: {t*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"text  grad remat={remat}: FAILED {str(e)[:120]}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "attn"
    if which == "attn":
        bench_attention()
    elif which == "gemm":
        bench_gemm()
    elif which == "step":
        bench_step(remat=True)
        bench_step(remat=True, augment=False)
    elif which == "flyp":
        bench_flyp_step(remat=True)
    elif which == "towers":
        bench_towers()
    else:
        raise SystemExit(f"unknown: {which}")


if __name__ == "__main__":
    main()
