"""res5_norm ablation plumbing (reference GN-vs-BN table,
MNISTISEG_N3_K3 notebook: GN 0.965 vs BN 0.919)."""
import jax
import jax.numpy as jnp
import pytest

from fgn_tpu.models.resnet import SharedRes5


@pytest.mark.parametrize("norm", ["gn", "bn"])
def test_shared_res5_norm_variants(norm):
    mod = SharedRes5(norm=norm)
    x = jnp.ones((2, 7, 7, 1024))
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(mod.apply)(params, x)
    assert y.shape == (2, 7, 7, 1024)
    assert bool(jnp.all(jnp.isfinite(y)))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    norm_scales = {n for n in names if "'bn" in n and "scale" in n}
    assert norm_scales, names
    # bn = FrozenAffine (scale/bias only, identity init); gn adds no
    # running stats either, but uses GroupNorm's own param names
    if norm == "bn":
        # identity at init: output == input up to conv contributions —
        # just assert the affine params exist and are identity
        affine = [v for p, v in flat if "scale" in jax.tree_util.keystr(p)]
        assert all(bool(jnp.all(a == 1.0)) for a in affine)


def test_fgn_config_res5_norm_reaches_shared5():
    from fgn_tpu.models.fgn import FGN, FGNConfig

    mod = FGN(cfg=FGNConfig(res5_norm="bn"))
    assert mod.cfg.res5_norm == "bn"
