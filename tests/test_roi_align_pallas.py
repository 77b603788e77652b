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


def test_roi_loop_matches_grid_kernel_bitexact(rng):
    """The in-kernel ROI loop (grid B × C/CC, round-5) must be
    BIT-identical to the 3-D-grid kernel: same chunk size, same two
    contractions per chunk, only the sweep moved inside the kernel."""
    B, H, W, C = 2, 10, 12, 16
    fmap = rng.rand(B, H, W, C).astype(np.float32)
    rois = (rng.rand(B, 6, 4).astype(np.float32) * 8).reshape(B, 6, 4)
    rois[..., 2:] = rois[..., :2] + 4
    kw = dict(roi_chunk=2, channel_block=8, interpret=True)
    a = np.asarray(
        roi_align_pallas(jnp.asarray(fmap), jnp.asarray(rois), 4,
                         roi_loop=True, **kw)
    )
    b = np.asarray(
        roi_align_pallas(jnp.asarray(fmap), jnp.asarray(rois), 4,
                         roi_loop=False, **kw)
    )
    assert np.array_equal(a, b), np.abs(a - b).max()


@pytest.mark.parametrize("roi_loop", [True, False])
def test_pallas_bf16_in_out_parity(rng, roi_loop):
    """Production numerics path (VERDICT r4 item 5): bf16 fmap in, bf16
    out. The kernel casts bf16 → f32 in-VMEM, contracts in f32 and
    rounds once on store — so vs the f32 gather reference evaluated on
    the SAME bf16-quantized inputs the only divergence is f32
    accumulation order + the single output rounding: ≤ 2 bf16 ulp at
    unit scale."""
    B, H, W, C = 2, 12, 14, 16
    fmap32 = rng.rand(B, H, W, C).astype(np.float32)
    fmap_bf16 = jnp.asarray(fmap32, jnp.bfloat16)
    rois = np.array(
        [
            [[1.0, 1.0, 9.0, 9.0], [0.0, 0.0, 14.0, 12.0],
             [3.2, 2.1, 7.9, 10.4], [2.0, 2.0, 10.0, 10.0]],
            [[2.0, 3.0, 6.0, 6.0], [0.5, 0.5, 2.0, 2.0],
             [5.0, 5.0, 13.0, 11.0], [1.0, 0.0, 12.0, 6.0]],
        ],
        np.float32,
    )
    got = roi_align_pallas(
        fmap_bf16, jnp.asarray(rois), 7, roi_chunk=2, channel_block=8,
        interpret=True, roi_loop=roi_loop,
    )
    assert got.dtype == jnp.bfloat16  # native-dtype out (commit 1e0e49f)
    ref = np.asarray(
        roi_align(fmap_bf16.astype(jnp.float32), jnp.asarray(rois), 7)
    )
    err = np.abs(np.asarray(got, np.float32) - ref)
    assert err.max() < 2 * 2.0 ** -8, err.max()


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
