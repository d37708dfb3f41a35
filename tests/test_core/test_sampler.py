"""OHEM pixel sampler tests (≙ reference ``tests/test_sampler.py``)."""
import jax.numpy as jnp
import numpy as np

from stc_unet_tpu.core import OHEMPixelSampler


class _Ctx:
    ignore_index = 255
    loss_decode = dict(type='CrossEntropyLoss', use_sigmoid=False,
                       loss_weight=1.0)


def _fake_logits_labels():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, size=(2, 8, 8)))
    return logits, labels


def test_ohem_thresh_mode():
    logits, labels = _fake_logits_labels()
    sampler = OHEMPixelSampler(context=_Ctx(), thresh=0.7, min_kept=10)
    w = sampler.sample(logits, labels)
    assert w.shape == (2, 8, 8)
    assert float(w.min()) >= 0 and float(w.max()) <= 1
    # at least min_kept*N pixels kept
    assert int((np.asarray(w) > 0).sum()) >= 20


def test_ohem_loss_mode():
    logits, labels = _fake_logits_labels()
    sampler = OHEMPixelSampler(context=_Ctx(), thresh=None, min_kept=10)
    w = sampler.sample(logits, labels)
    assert w.shape == (2, 8, 8)
    assert float(jnp.sum(w)) > 0


def test_ohem_ignores_ignore_index():
    logits, labels = _fake_logits_labels()
    labels = labels.at[0].set(255)
    sampler = OHEMPixelSampler(context=_Ctx(), thresh=0.7, min_kept=10)
    w = sampler.sample(logits, labels)
    assert float(jnp.sum(w[0])) == 0.0


def test_ohem_loss_mode_keeps_exactly_k_under_ties():
    """All-equal losses (uniform logits): reference keeps exactly
    min_kept * N by sort index; a strict > threshold would keep zero."""
    logits = jnp.zeros((2, 8, 8, 4), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 8, 8)))
    sampler = OHEMPixelSampler(context=_Ctx(), thresh=None, min_kept=10)
    w = sampler.sample(logits, labels)
    assert int(np.asarray(w).sum()) == 20  # min_kept * batch


def test_ohem_loss_mode_keeps_all_when_fewer_valid_than_kept():
    logits, labels = _fake_logits_labels()
    # only 5 valid pixels, min_kept=10 per image -> keep all 5
    labels = labels.at[:].set(255)
    labels = labels.at[0, 0, :5].set(1)
    sampler = OHEMPixelSampler(context=_Ctx(), thresh=None, min_kept=10)
    w = sampler.sample(logits, labels)
    assert int(np.asarray(w).sum()) == 5
