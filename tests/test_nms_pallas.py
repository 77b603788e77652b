"""Pallas NMS keep-mask kernel: exact parity with the blocked XLA sweep
(interpret mode on CPU; the kernel compiles natively on TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgn_tpu.ops.nms import batched_nms, nms_padded
from fgn_tpu.ops.nms_pallas import greedy_alive_pallas, nms_padded_pallas

ALIVE_FN = functools.partial(greedy_alive_pallas, interpret=True)


def _random_boxes(rng, shape):
    ctr = rng.uniform(0, 100, shape + (2,))
    wh = rng.uniform(5, 40, shape + (2,))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    return boxes.astype(np.float32)


@pytest.mark.parametrize(
    "m,thr", [(256, 0.5), (300, 0.7), (128, 0.3), (513, 0.5)]
)
def test_pallas_nms_matches_xla(m, thr):
    rng = np.random.default_rng(m)
    boxes = _random_boxes(rng, (m,))
    scores = rng.uniform(size=m).astype(np.float32)
    valid = rng.uniform(size=m) > 0.1
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    ref = nms_padded(*args, thr, 100)
    got = nms_padded_pallas(*args, thr, 100, interpret=True)
    for a, b, name in zip(ref, got, ["boxes", "scores", "idx", "valid"]):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_nms_under_vmap():
    """The model calls NMS under jax.vmap (fgn.py get_proposals /
    nms_one); the kernel must batch identically."""
    rng = np.random.default_rng(7)
    B, M = 4, 256
    boxes = _random_boxes(rng, (B, M))
    scores = rng.uniform(size=(B, M)).astype(np.float32)
    valid = rng.uniform(size=(B, M)) > 0.1
    cls = rng.integers(0, 4, (B, M))

    f_ref = jax.vmap(lambda b, s, v: nms_padded(b, s, v, 0.5, 64))
    f_pal = jax.vmap(
        lambda b, s, v: nms_padded(b, s, v, 0.5, 64, alive_fn=ALIVE_FN)
    )
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    for a, b in zip(f_ref(*args), f_pal(*args)):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    g_ref = jax.vmap(
        lambda b, s, c, v: batched_nms(b, s, c, v, 0.5, 64)
    )
    g_pal = jax.vmap(
        lambda b, s, c, v: batched_nms(
            b, s, c, v, 0.5, 64, alive_fn=ALIVE_FN
        )
    )
    args = (
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.asarray(cls), jnp.asarray(valid),
    )
    for a, b in zip(g_ref(*args), g_pal(*args)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pallas_nms_degenerate_cases():
    # all-invalid input, identical boxes, single block
    boxes = jnp.asarray(
        np.tile(np.array([[10, 10, 50, 50]], np.float32), (128, 1))
    )
    scores = jnp.asarray(np.linspace(1, 0, 128, dtype=np.float32))
    valid = jnp.ones(128, bool)
    ref = nms_padded(boxes, scores, valid, 0.5, 16)
    got = nms_padded_pallas(boxes, scores, valid, 0.5, 16, interpret=True)
    for a, b in zip(ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(got[3]).sum()) == 1  # one survivor

    none = jnp.zeros(128, bool)
    got = nms_padded_pallas(boxes, scores, none, 0.5, 16, interpret=True)
    assert not np.asarray(got[3]).any()
