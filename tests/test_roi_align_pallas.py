import jax.numpy as jnp
import numpy as np
import pytest

from fgn_tpu.ops.roi_align import roi_align
from fgn_tpu.ops.roi_align_pallas import roi_align_pallas


@pytest.mark.parametrize("aligned", [True, False])
def test_pallas_matches_gather_impl(rng, aligned):
    B, H, W, C = 2, 12, 14, 8
    fmap = rng.rand(B, H, W, C).astype(np.float32)
    rois = np.array(
        [
            [[1.0, 1.0, 9.0, 9.0], [0.0, 0.0, 14.0, 12.0], [3.2, 2.1, 7.9, 10.4]],
            [[2.0, 3.0, 6.0, 6.0], [0.5, 0.5, 2.0, 2.0], [5.0, 5.0, 13.0, 11.0]],
        ],
        np.float32,
    )
    ref = np.asarray(
        roi_align(jnp.asarray(fmap), jnp.asarray(rois), 4, aligned=aligned)
    )
    got = np.asarray(
        roi_align_pallas(
            jnp.asarray(fmap), jnp.asarray(rois), 4, aligned=aligned,
            roi_chunk=2, channel_block=8, interpret=True,
        )
    )
    assert np.allclose(got, ref, atol=1e-4), np.abs(got - ref).max()


def test_pallas_with_scale_and_padding(rng):
    # R not divisible by roi_chunk exercises the padding path.
    B, H, W, C = 1, 8, 8, 16
    fmap = rng.rand(B, H, W, C).astype(np.float32)
    rois = (rng.rand(B, 5, 4).astype(np.float32) * 60).reshape(B, 5, 4)
    rois[..., 2:] = rois[..., :2] + 30
    ref = np.asarray(
        roi_align(jnp.asarray(fmap), jnp.asarray(rois), 7, spatial_scale=1 / 16)
    )
    got = np.asarray(
        roi_align_pallas(
            jnp.asarray(fmap), jnp.asarray(rois), 7, spatial_scale=1 / 16,
            roi_chunk=4, channel_block=16, interpret=True,
        )
    )
    assert got.shape == ref.shape == (1, 5, 7, 7, 16)
    assert np.allclose(got, ref, atol=1e-4)


def test_pallas_vjp_matches_gather_grad(rng):
    import jax

    B, H, W, C = 1, 10, 12, 8
    fmap = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    rois = jnp.asarray(
        np.array([[[1.0, 1.0, 9.0, 8.0], [2.5, 0.5, 11.0, 9.5]]], np.float32)
    )
    cot = rng.rand(B, 2, 4, 4, C).astype(np.float32)

    def loss_gather(f):
        out = roi_align(f, rois, 4)
        return jnp.sum(out * cot)

    def loss_pallas(f):
        out = roi_align_pallas(
            f, rois, 4, roi_chunk=2, channel_block=8, interpret=True
        )
        return jnp.sum(out * cot)

    g_ref = np.asarray(jax.grad(loss_gather)(fmap))
    g_got = np.asarray(jax.grad(loss_pallas)(fmap))
    assert np.allclose(g_got, g_ref, atol=1e-4), np.abs(g_got - g_ref).max()
