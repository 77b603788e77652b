"""Random positive/negative sampling with static output shapes.

mmdet RandomSampler semantics (vendored by the reference at
subprojects/sp02_omniiseg_fgn_mmdet/my_random_sampler.py, configured at
fgn_r50_c4_densecl.py:141-147,164-170):

  * sample at most ``num * pos_fraction`` positives uniformly at random;
  * fill the remaining ``num - n_pos`` slots with random negatives
    (neg_pos_ub = -1: no cap);
  * if there are not enough candidates the result is short — here the
    result is always ``num`` slots with a validity mask instead.

Output layout matches mmdet's downstream expectation: positives occupy the
first ``n_pos`` slots, negatives the rest (reference FGNBBoxHead relies on
this: fgn_roi_head.py:136-158).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    inds: jnp.ndarray  # (num,) int32 indices into the candidate axis
    is_pos: jnp.ndarray  # (num,) bool — slot holds a positive
    valid: jnp.ndarray  # (num,) bool — slot holds a real sample
    n_pos: jnp.ndarray  # () int32


def _rand_topk_indices(key, mask: jnp.ndarray, k: int):
    """Indices of up to k uniformly-random True entries of mask.

    Returns (idx (k,), picked (k,) bool)."""
    r = jax.random.uniform(key, mask.shape)
    # Invalid entries get score -inf so they sort last under top_k.
    score = jnp.where(mask, r, -jnp.inf)
    k_eff = min(k, mask.shape[0])
    _, idx = jax.lax.top_k(score, k_eff)
    if k_eff < k:  # fewer candidates than slots: pad (never picked)
        idx = jnp.concatenate([idx, jnp.zeros(k - k_eff, idx.dtype)])
    count = jnp.sum(mask.astype(jnp.int32))
    picked = jnp.arange(k) < jnp.minimum(count, k)
    return idx.astype(jnp.int32), picked


def random_sample_pos_neg(
    key: jax.Array,
    pos_mask: jnp.ndarray,  # (A,) bool
    neg_mask: jnp.ndarray,  # (A,) bool
    num: int,
    pos_fraction: float,
) -> SampleResult:
    kp, kn = jax.random.split(key)
    num_expected_pos = int(num * pos_fraction)

    pos_idx, pos_picked = _rand_topk_indices(kp, pos_mask, num_expected_pos)
    neg_idx, neg_picked = _rand_topk_indices(kn, neg_mask, num)

    n_pos = jnp.sum(pos_picked.astype(jnp.int32))
    n_neg_avail = jnp.sum(neg_picked.astype(jnp.int32))
    n_neg = jnp.minimum(num - n_pos, n_neg_avail)

    slots = jnp.arange(num)
    is_pos = slots < n_pos
    valid = slots < (n_pos + n_neg)
    # slot i: pos_idx[i] while positive, else neg_idx[i - n_pos]
    neg_slot = jnp.clip(slots - n_pos, 0, num - 1)
    pos_slot = jnp.clip(slots, 0, max(num_expected_pos - 1, 0))
    inds = jnp.where(
        is_pos,
        pos_idx[pos_slot] if num_expected_pos > 0 else jnp.zeros_like(slots),
        neg_idx[neg_slot],
    ).astype(jnp.int32)
    return SampleResult(inds=inds, is_pos=is_pos, valid=valid, n_pos=n_pos)
