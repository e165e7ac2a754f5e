"""Scaled-cosine Attention variant parity vs the reference torch module
(transformer.py:88-162) — the CustomResidualAttentionBlock attention."""
import numpy as np
import pytest
import jax.numpy as jnp

from latteclip_tpu.models.layers import scaled_cosine_attention

torch = pytest.importorskip("torch")
from ref_oracle import load_reference_open_clip  # noqa: E402

D, H, B, L = 64, 4, 3, 10


def _params_from_torch(mod):
    p = {
        "in_proj_w": np.asarray(mod.in_proj_weight.detach()).T.copy(),
        "in_proj_b": np.asarray(mod.in_proj_bias.detach()),
        "out_proj_w": np.asarray(mod.out_proj.weight.detach()).T.copy(),
        "out_proj_b": np.asarray(mod.out_proj.bias.detach()),
    }
    if mod.logit_scale is not None:
        p["logit_scale"] = np.asarray(mod.logit_scale.detach())
    if mod.head_scale is not None:
        p["head_scale"] = np.asarray(mod.head_scale.detach())
    return {k: jnp.asarray(v) for k, v in p.items()}


@pytest.mark.parametrize("scaled_cosine", [True, False])
def test_matches_reference_attention(scaled_cosine):
    oc = load_reference_open_clip()
    if oc is None:
        pytest.skip("reference open_clip unavailable")
    torch.manual_seed(0)
    mod = oc.transformer.Attention(D, num_heads=H, scaled_cosine=scaled_cosine).eval()
    x = np.random.default_rng(0).standard_normal((B, L, D)).astype(np.float32) * 0.5

    with torch.no_grad():
        # reference forward takes [L, N, C]
        want = mod(torch.tensor(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()

    ours = np.asarray(
        scaled_cosine_attention(jnp.asarray(x), _params_from_torch(mod), H,
                                dtype=jnp.float32)
    )
    np.testing.assert_allclose(ours, want, atol=2e-5, rtol=1e-4)


def test_scale_heads_variant():
    """The reference's ``scale_heads`` path is itself broken (latent bug:
    transformer.py:155-157 views a [N*H, L, head_dim] tensor as
    (N, H, L, dim), which raises for H > 1) — verified below. Our variant
    implements the intended per-head scaling: head_scale == 1 is a no-op and
    scaling head h scales only that head's contribution."""
    oc = load_reference_open_clip()
    if oc is not None:
        torch.manual_seed(0)
        mod = oc.transformer.Attention(D, num_heads=H, scale_heads=True).eval()
        with torch.no_grad():
            with pytest.raises(RuntimeError):
                mod(torch.zeros(L, B, D))

    rng = np.random.default_rng(1)
    p = {
        "in_proj_w": jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.1),
        "in_proj_b": jnp.zeros(3 * D),
        "out_proj_w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1),
        "out_proj_b": jnp.zeros(D),
        "head_scale": jnp.ones((H, 1, 1)),
    }
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    base = scaled_cosine_attention(x, {k: v for k, v in p.items() if k != "head_scale"},
                                   H, dtype=jnp.float32)
    ones = scaled_cosine_attention(x, p, H, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(base), np.asarray(ones), atol=1e-6)
    scaled = scaled_cosine_attention(
        x, dict(p, head_scale=jnp.ones((H, 1, 1)) * 2.0), H, dtype=jnp.float32
    )
    assert not np.allclose(np.asarray(scaled), np.asarray(ones))
