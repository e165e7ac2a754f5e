"""DeviceMeterBank: every-step averages with one sync per log point.

The reference updates its loss AverageMeters from EVERY step
(train.py:584-607); round 2 only sampled every Nth step, so ``loss.avg``
averaged the sampled values. The bank must average all steps.
"""
import jax.numpy as jnp
import numpy as np

from latteclip_tpu.obs.meters import AverageMeter, DeviceMeterBank


def test_bank_averages_every_step_not_just_fetched_ones():
    bank = DeviceMeterBank()
    losses = [3.0, 2.0, 1.0, 5.0, 4.0]
    for i, v in enumerate(losses):
        bank.update({"loss": jnp.float32(v), "logit_scale": jnp.float32(10 + i)})
        if i == 2:  # mid-epoch log point
            meters = bank.fetch()
            assert meters["loss"].val == 1.0
            np.testing.assert_allclose(meters["loss"].avg, np.mean(losses[:3]))
    meters = bank.fetch()
    assert meters["loss"].val == losses[-1]
    np.testing.assert_allclose(meters["loss"].avg, np.mean(losses))
    assert meters["logit_scale"].val == 14.0
    assert meters["loss"].count == 5


def test_bank_skips_nonscalar_entries():
    bank = DeviceMeterBank()
    bank.update({"loss": jnp.float32(1.0), "per_class": jnp.ones((4,))})
    meters = bank.fetch()
    assert "loss" in meters and "per_class" not in meters


def test_average_meter_semantics():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.val == 4.0 and m.avg == 3.0
