import jax.numpy as jnp
import numpy as np

from fgn_tpu.models.losses import (
    accuracy_balanced,
    sigmoid_bce,
    smooth_l1,
    softmax_ce,
)


def test_sigmoid_bce_hand():
    logits = jnp.array([0.0, 100.0, -100.0])
    targets = jnp.array([1.0, 1.0, 0.0])
    w = jnp.ones(3)
    # loss = [ln2, ~0, ~0]; avg_factor 3
    got = float(sigmoid_bce(logits, targets, w, 3.0))
    assert abs(got - np.log(2) / 3) < 1e-5


def test_sigmoid_bce_weights_and_avg():
    logits = jnp.array([0.0, 0.0])
    targets = jnp.array([1.0, 0.0])
    w = jnp.array([1.0, 0.0])  # second sample masked
    got = float(sigmoid_bce(logits, targets, w, 2.0))
    assert abs(got - np.log(2) / 2) < 1e-6


def test_softmax_ce_hand():
    logits = jnp.array([[2.0, 0.0, 0.0]])
    labels = jnp.array([0])
    w = jnp.ones(1)
    p = np.exp(2) / (np.exp(2) + 2)
    got = float(softmax_ce(logits, labels, w, 1.0))
    assert abs(got + np.log(p)) < 1e-5


def test_softmax_ce_stability_large_logits():
    logits = jnp.array([[1000.0, 0.0]])
    got = float(softmax_ce(logits, jnp.array([0]), jnp.ones(1), 1.0))
    assert np.isfinite(got) and got < 1e-3


def test_smooth_l1_regimes():
    pred = jnp.array([0.5, 3.0])
    tgt = jnp.zeros(2)
    w = jnp.ones(2)
    # |0.5| < 1 → 0.5*0.25 = 0.125 ; |3| → 3 - 0.5 = 2.5
    got = float(smooth_l1(pred, tgt, w, 1.0))
    assert abs(got - (0.125 + 2.5)) < 1e-6


def test_balanced_accuracy():
    # class 0: 2 samples, 1 correct (recall .5); class 1: 1 sample, correct (1.0)
    logits = jnp.array([[5.0, 0.0], [0.0, 5.0], [0.0, 5.0]])
    labels = jnp.array([0, 0, 1])
    w = jnp.ones(3)
    acc, bal = accuracy_balanced(logits, labels, w, 2)
    assert abs(float(acc) - 2 / 3) < 1e-6
    assert abs(float(bal) - 0.75) < 1e-6


def test_balanced_accuracy_ignores_masked():
    logits = jnp.array([[5.0, 0.0], [5.0, 0.0]])
    labels = jnp.array([0, 1])
    w = jnp.array([1.0, 0.0])
    acc, bal = accuracy_balanced(logits, labels, w, 2)
    assert float(acc) == 1.0
    assert float(bal) == 1.0
