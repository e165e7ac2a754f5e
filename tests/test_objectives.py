"""Objective functions: SigLIP (full vs ring over a mesh), distillation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from latteclip_tpu.train.objective import (
    distill_clip_loss,
    siglip_full_loss,
    siglip_ring_loss,
)


def _feats(n, d, seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


def test_siglip_full_loss_prefers_aligned():
    img = _feats(16, 32, 0)
    loss_aligned = float(siglip_full_loss(img, img, 20.0, -10.0))
    loss_random = float(siglip_full_loss(img, _feats(16, 32, 1), 20.0, -10.0))
    assert loss_aligned < loss_random


def test_siglip_ring_matches_full():
    """Ring ppermute exchange over 8 devices == full-matrix loss."""
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices), ("data",))
    img = _feats(32, 16, 0)
    txt = _feats(32, 16, 1)
    scale, bias = jnp.float32(10.0), jnp.float32(-5.0)

    ring = shard_map(
        lambda i, t: siglip_ring_loss(i, t, scale, bias, "data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )
    ring_loss = float(jax.jit(ring)(img, txt))
    full_loss = float(siglip_full_loss(img, txt, scale, bias))
    assert ring_loss == pytest.approx(full_loss, rel=1e-5)


def test_siglip_ring_gradients_match_full():
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices), ("data",))
    img = _feats(16, 8, 0)
    txt = _feats(16, 8, 1)
    scale, bias = jnp.float32(5.0), jnp.float32(-2.0)

    ring = shard_map(
        lambda i, t: siglip_ring_loss(i, t, scale, bias, "data"),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )
    g_ring = jax.jit(jax.grad(lambda i, t: ring(i, t), argnums=(0, 1)))(img, txt)
    g_full = jax.jit(jax.grad(lambda i, t: siglip_full_loss(i, t, scale, bias), argnums=(0, 1)))(img, txt)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_distill_loss_zero_when_teacher_equals_student():
    img, txt = _feats(8, 16, 0), _feats(8, 16, 1)
    same = float(distill_clip_loss(img, txt, 10.0, img, txt, 10.0))
    # CE(p, p) == H(p) > 0, but must be the *minimum* over students
    other = float(distill_clip_loss(_feats(8, 16, 2), txt, 10.0, img, txt, 10.0))
    assert same < other


def test_distill_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    si, st = rng.randn(6, 8).astype(np.float32), rng.randn(6, 8).astype(np.float32)
    ti, tt = rng.randn(6, 8).astype(np.float32), rng.randn(6, 8).astype(np.float32)
    ours = float(distill_clip_loss(jnp.asarray(si), jnp.asarray(st), 7.0, jnp.asarray(ti), jnp.asarray(tt), 9.0))

    s_logits = torch.tensor(7.0 * si @ st.T)
    t_logits = torch.tensor(9.0 * ti @ tt.T)

    def dl(t, s):
        return -(t.softmax(dim=1) * s.log_softmax(dim=1)).sum(dim=1).mean(dim=0)

    ref = 0.5 * (dl(t_logits, s_logits) + dl(t_logits.T, s_logits.T))
    assert ours == pytest.approx(float(ref), rel=1e-5)
