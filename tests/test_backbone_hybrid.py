"""Hybrid backbone equivalence: the masked-dense execution plan must produce
bitwise-equal (up to float assoc) features to the fully-sparse plan with the
same parameters."""
import numpy as np
import pytest


@pytest.mark.parametrize("dfs", [1, 2, 3])
def test_dense_plan_matches_sparse(rng, dfs):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models.backbone import SpMiddleFHD

    sparse_shape = (41, 32, 32)
    b, v = 2, 80
    d, h, w = sparse_shape
    coords = np.stack(
        [rng.randint(0, b, b * v), rng.randint(0, d, b * v),
         rng.randint(0, h, b * v), rng.randint(0, w, b * v)], 1).astype(np.int32)
    feats = rng.randn(b * v, 4).astype(np.float32)
    valid = np.ones(b * v, bool)
    valid[-7:] = False

    args = (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), b,
            sparse_shape)

    ref_model = SpMiddleFHD(stage_capacity=(1024,) * 5, dense_from_stage=5)
    variables = ref_model.init(jax.random.PRNGKey(0), *args, train=False)
    want = np.asarray(ref_model.apply(variables, *args, train=False))

    hyb = SpMiddleFHD(stage_capacity=(1024,) * 5, dense_from_stage=dfs)
    # identical parameter tree by construction
    got = np.asarray(hyb.apply(variables, *args, train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_param_tree_identical_across_plans(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models.backbone import SpMiddleFHD

    sparse_shape = (41, 16, 16)
    coords = np.stack([np.zeros(20), rng.randint(0, 41, 20),
                       rng.randint(0, 16, 20), rng.randint(0, 16, 20)], 1).astype(np.int32)
    args = (jnp.asarray(rng.randn(20, 4).astype(np.float32)),
            jnp.asarray(coords), jnp.ones(20, bool), 1, sparse_shape)
    t1 = SpMiddleFHD(stage_capacity=(64,) * 5, dense_from_stage=5).init(
        jax.random.PRNGKey(0), *args, train=False)
    t2 = SpMiddleFHD(stage_capacity=(64,) * 5, dense_from_stage=2).init(
        jax.random.PRNGKey(0), *args, train=False)
    s1 = jax.tree_util.tree_structure(t1)
    s2 = jax.tree_util.tree_structure(t2)
    assert s1 == s2
    for a, b in zip(jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t2)):
        assert a.shape == b.shape
