import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import flows
from links_tpu.flows import coupling


@pytest.mark.parametrize("dim", [34, 22, 20, 14, 7])
def test_invertibility(dim):
    flow = flows.init_flow(jax.random.PRNGKey(0), dim, n_blocks=8, hidden=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, dim))
    z, ld_fwd = flows.forward(flow, x)
    x_rec, ld_inv = flows.inverse(flow, z)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=2e-4)
    # inverse logdet is the negation of forward logdet
    np.testing.assert_allclose(np.asarray(ld_fwd), -np.asarray(ld_inv), rtol=1e-4, atol=1e-4)


def test_logdet_matches_autodiff_jacobian():
    dim = 6
    flow = flows.init_flow(jax.random.PRNGKey(2), dim, n_blocks=3, hidden=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, dim))

    def f_single(xi):
        z, _ = flows.forward(flow, xi[None])
        return z[0]

    _, ld = flows.forward(flow, x)
    for i in range(x.shape[0]):
        J = jax.jacfwd(f_single)(x[i])
        _, want = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(ld[i]), want, rtol=1e-4, atol=1e-4)


def test_orthogonal_mixing():
    flow = flows.init_flow(jax.random.PRNGKey(4), 22, n_blocks=8, hidden=8)
    w = np.asarray(flow.perm)
    eye = np.eye(22)
    for k in range(8):
        np.testing.assert_allclose(w[k] @ w[k].T, eye, atol=1e-5)
        assert abs(np.linalg.det(w[k]) - 1.0) < 1e-4
    # distinct blocks get distinct matrices
    assert not np.allclose(w[0], w[1])


def test_identity_at_init_modulo_mixing():
    # At init the global affine is identity (gs=1, gb=0); coupling is not
    # identity (subnet has torch-default random init) but stays small
    # because of the 0.1 output scaling.
    dim = 10
    params, w = coupling.init_block(jax.random.PRNGKey(5), dim, hidden=32)
    gs = np.asarray(0.1 * (2.0 * jax.nn.softplus(0.5 * params["global_scale"])))
    np.testing.assert_allclose(gs, 1.0, rtol=1e-6)


def test_scan_matches_unrolled_blocks():
    dim = 14
    flow = flows.init_flow(jax.random.PRNGKey(6), dim, n_blocks=4, hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, dim))
    z_scan, ld_scan = flows.forward(flow, x)
    h, ld = x, jnp.zeros(8)
    for k in range(4):
        blk = jax.tree.map(lambda a, k=k: a[k], flow.params)
        h, j = coupling.block_forward(blk, flow.perm[k], h)
        ld = ld + j
    np.testing.assert_allclose(np.asarray(z_scan), np.asarray(h), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_scan), np.asarray(ld), rtol=1e-5)


def test_nll_decreases_with_training_signal():
    # one gradient step on NLL should reduce NLL on the same batch
    import optax

    dim = 14
    flow = flows.init_flow(jax.random.PRNGKey(8), dim, hidden=128)
    x = jax.random.normal(jax.random.PRNGKey(9), (256, dim)) * 0.3

    def loss_fn(params):
        z, ld = flows.forward(flows.Flow(params, flow.perm), x)
        return flows.nll(z, ld).mean()

    opt = optax.adam(1e-3)
    state = opt.init(flow.params)
    l0, g = jax.value_and_grad(loss_fn)(flow.params)
    updates, state = opt.update(g, state, flow.params)
    p1 = optax.apply_updates(flow.params, updates)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)


def test_draw_samples_zero_root_and_shape():
    flow = flows.init_flow(jax.random.PRNGKey(10), 34, hidden=64)
    x = jax.random.normal(jax.random.PRNGKey(11), (32, 34)) * 0.1
    s = flows.draw_samples(flow, x, jax.random.PRNGKey(12))
    assert s.shape == (32, 34)
    np.testing.assert_allclose(np.asarray(s).reshape(-1, 2, 17)[:, :, 0], 0.0, atol=1e-6)


def test_sampling_has_no_gradient():
    flow = flows.init_flow(jax.random.PRNGKey(13), 14, hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(14), (8, 14))

    def loss(params):
        s = flows.draw_samples(flows.Flow(params, flow.perm), x, jax.random.PRNGKey(0))
        return (s**2).sum()

    g = jax.grad(loss)(flow.params)
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g))
    assert total == 0.0


def test_soft_cap_nll_identity_below_and_log_above():
    v = jnp.array([-150.0, 0.0, 499.9, 500.0, 1e6, 1e13])
    capped = flows.soft_cap_nll(v, 500.0)
    # identity at or below the cap
    np.testing.assert_allclose(np.asarray(capped[:4]), np.asarray(v[:4]))
    # logarithmic above: cap + log1p(v - cap)
    np.testing.assert_allclose(float(capped[4]), 500.0 + np.log1p(1e6 - 500.0), rtol=1e-6)
    assert float(capped[5]) < 540.0  # 1e13 folds to ~cap+30
    # monotone
    assert np.all(np.diff(np.asarray(capped)) >= 0)


def test_soft_cap_nll_gradient_damped_not_zero():
    g = jax.grad(lambda x: flows.soft_cap_nll(x, 500.0).sum())(
        jnp.array([100.0, 1e6]))
    assert float(g[0]) == 1.0  # untouched below cap
    assert 0.0 < float(g[1]) < 1e-5  # damped to ~1/(v-cap), never dead


def test_capped_flow_loss_matches_uncapped_on_healthy_data():
    from links_tpu.objectives import flow_nll

    flow = flows.init_flow(jax.random.PRNGKey(0), 34, n_blocks=4, hidden=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 34)) * 0.1
    key = jax.random.PRNGKey(2)
    l0, _ = flow_nll.full_flow_loss(flow.params, flow.perm, x, key)
    l1, _ = flow_nll.full_flow_loss(flow.params, flow.perm, x, key, nll_cap=1e4)
    # healthy NLLs sit far below any sensible cap -> bit-identical loss
    np.testing.assert_allclose(float(l0), float(l1), rtol=0, atol=0)
