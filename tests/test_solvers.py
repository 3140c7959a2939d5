"""Unit tests for the subproblem solvers against independent numpy oracles,
plus re-verification of the no-op-backtracking proofs documented in
solvers/closed_form.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from admm_lstm_tpu.solvers import closed_form as cf
from admm_lstm_tpu.solvers.normal_eq import gauss_newton_ridge_update
from admm_lstm_tpu.solvers.prox_linear import h_final_update, weight_stage_update

RNG = np.random.default_rng(7)


def _r(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_gate_ifgo_update_oracle():
    lam, act, p1, p2, p3, var2, lam2 = (_r(8, 5) for _ in range(7))
    rho1, rho2 = np.float32(0.7), np.float32(0.3)
    got = np.asarray(cf.gate_ifgo_update(jnp.asarray(lam), rho1, jnp.asarray(act),
                                         jnp.asarray(p1), jnp.asarray(p2),
                                         jnp.asarray(p3), jnp.asarray(var2),
                                         rho2, jnp.asarray(lam2)))
    # Independent transcription of admm.py:384-386.
    want = -(lam - rho1 * act + (rho2 * (p2 * p3 - var2) - lam2) * p1) / (
        rho1 + rho2 * p1 * p1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_c_update_equals_literal_backtracking():
    """The c update with fixed theta=1/2 must equal a literal transcription
    of the reference's loop (admm.py:405-436) — which never iterates."""
    c, o, h, lam_h, lam_c, f_new, c_prev, i_new, g_new = (_r(6, 4)
                                                          for _ in range(9))
    rho_h, rho_c = np.float32(0.2), np.float32(0.5)

    got = np.asarray(cf.c_update(*map(jnp.asarray, (c, o, h, lam_h, lam_c)),
                                 rho_h, rho_c,
                                 *map(jnp.asarray, (f_new, c_prev, i_new, g_new))))

    # Literal loop in numpy:
    div_h, div_c = lam_h / rho_h, lam_c / rho_c
    z = h + div_h

    def original(ct):
        return 0.5 * np.sum((np.tanh(ct) * o - z) ** 2)

    tc = np.tanh(c)
    grad = (tc * o - z) * o * (1 - tc ** 2)
    f0 = original(c)

    def assistant(ct, theta):
        return f0 + np.sum(grad * (ct - c)) + 0.5 * theta * np.sum((ct - c) ** 2)

    a_term = div_c - f_new * c_prev - i_new * g_new

    def compute_c(theta):
        return (theta * c - grad - rho_c * a_term) / (rho_c + theta)

    theta, current, iters = 1.0, c.copy(), 0
    while original(current) > assistant(current, theta):
        theta *= 2
        current = compute_c(theta)
        iters += 1
        assert iters < 100
    assert iters == 0, 'reference c loop unexpectedly iterated'
    theta /= 2
    np.testing.assert_allclose(got, compute_c(theta), atol=1e-5)


def test_wy_update_equals_literal_backtracking():
    """Same no-op proof check for the wy search (admm.py:246-280)."""
    h_last, a, wy = _r(12, 5), _r(12, 2), _r(5, 2)
    rho_y, beta_wy = np.float32(0.01), np.float32(1e-6)

    got = np.asarray(cf.wy_update(jnp.asarray(wy), jnp.asarray(h_last),
                                  jnp.asarray(a), rho_y, beta_wy,
                                  jnp.zeros((12, 2), jnp.float32), False,
                                  lax.Precision.HIGHEST))

    def original(b):
        return 0.5 * rho_y * np.sum((h_last @ b - a) ** 2)

    grad = rho_y * h_last.T @ (h_last @ wy - a)

    def estimated(b, theta):
        # Quirk: evaluates original at the CANDIDATE (admm.py:262-264).
        return original(b) + np.sum(grad * (b - wy)) + 0.5 * theta * np.sum(
            (b - wy) ** 2)

    theta, iters = 1.0, 0
    beta = wy + grad / theta
    while original(beta) > estimated(beta, theta):
        theta *= 2
        beta = wy + grad / theta
        iters += 1
        assert iters < 100
    assert iters == 0, 'reference wy loop unexpectedly iterated'
    theta /= 2
    want = (theta * wy - grad) / (theta + beta_wy)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_weight_stage_oracle_single_gate():
    """Lockstep 4-gate weight solver vs a literal single-gate transcription
    of admm.py:282-343."""
    T, B, D, H = 5, 16, 3, 4
    m = _r(T, B, D)
    fixed = _r(4, T, B, H) * 0.2
    w = _r(4, D, H) * 0.3
    gate = _r(4, T, B, H) * 0.4
    dual = _r(4, T, B, H) * 0.05
    rho = np.asarray([1.0, 0.9, 0.8, 0.7], np.float32)
    beta = np.asarray([1e-6, 1e-6, 1e-6, 1e-6], np.float32)
    is_tanh = np.asarray([False, False, True, False])
    target = dual / rho[:, None, None, None] + gate

    res = weight_stage_update(*map(jnp.asarray, (m, fixed, w, target)),
                              jnp.asarray(rho), jnp.asarray(beta),
                              jnp.asarray(is_tanh), T, 60,
                              lax.Precision.HIGHEST)

    def sig(v):
        return 1 / (1 + np.exp(-v))

    for g in range(4):
        act = (lambda v: np.tanh(v)) if is_tanh[g] else sig
        d_act = ((lambda v: 1 - np.tanh(v) ** 2) if is_tanh[g]
                 else (lambda v: sig(v) * (1 - sig(v))))

        def original(wc):
            total = 0.0
            for t in range(T):
                r = act(m[t] @ wc + fixed[g, t]) - target[g, t]
                total += 0.5 * rho[g] * np.sum(r * r)
            return total

        grad = np.zeros_like(w[g])
        for t in range(T):
            pre = m[t] @ w[g] + fixed[g, t]
            grad += m[t].T @ ((act(pre) - target[g, t]) * d_act(pre))
        grad *= rho[g]

        f0 = original(w[g])
        theta, iters = 1.0, 0
        beta_c = w[g] + grad / theta
        while original(beta_c) > (f0 + np.sum(grad * (beta_c - w[g]))
                                  + T * 0.5 * theta * np.sum((beta_c - w[g]) ** 2)):
            theta *= 2
            beta_c = w[g] + grad / theta
            iters += 1
            assert iters < 200
        theta /= 2
        want = (0.5 * rho[g] * T * theta * w[g] - grad) / (
            beta[g] + 0.5 * rho[g] * theta * T)
        np.testing.assert_allclose(np.asarray(res.weights[g]), want,
                                   atol=2e-4, err_msg=f'gate {g}')
        assert float(res.theta[g]) == pytest.approx(theta)


def test_h_final_oracle():
    B, H, O = 10, 6, 2
    h_old = _r(B, H)
    o_new = (1 / (1 + np.exp(-_r(B, H)))).astype(np.float32)
    tanh_c = np.tanh(_r(B, H))
    lam_h = _r(B, H) * 0.01
    wy = _r(H, O)
    a_old = _r(B, O)
    rho_h, rho_y = np.float32(0.1), np.float32(0.05)

    res = h_final_update(jnp.asarray(h_old), jnp.asarray(o_new),
                         jnp.asarray(tanh_c), jnp.asarray(lam_h), rho_h,
                         jnp.asarray(wy), jnp.asarray(a_old), rho_y,
                         jnp.zeros((B, O), jnp.float32),
                         with_dual_y=False, theta0=0.1, theta_max=1.0,
                         max_iters=60, precision=lax.Precision.HIGHEST)

    # Literal transcription of admm.py:439-487.
    grad = rho_y * (h_old @ wy - a_old) @ wy.T

    def original(hc):
        return 0.5 * rho_y * np.sum((hc @ wy - a_old) ** 2)

    f0 = original(h_old)

    def estimated(b, th):
        return f0 + np.sum(grad * (b - h_old)) + 0.5 * th * np.sum((b - h_old) ** 2)

    def compute_h(th):
        return (th * h_old + rho_h * o_new * tanh_c - lam_h - grad) / (th + rho_h)

    theta = 0.1
    beta = compute_h(theta)
    while original(beta) > estimated(beta, theta):
        theta *= 2
        beta = compute_h(theta)
        if theta >= 1.0:
            break
    theta /= 2
    np.testing.assert_allclose(np.asarray(res.h), compute_h(theta), atol=1e-5)
    assert float(res.theta) == pytest.approx(theta)


def test_gauss_newton_reduces_objective():
    """The exact-solve mode must reduce the regularized objective at least as
    much as one prox-linear step on a random instance."""
    T, B, D, H = 4, 32, 3, 5
    m = _r(T, B, D)
    fixed = _r(4, T, B, H) * 0.1
    w = _r(4, D, H) * 0.2
    target = np.clip(_r(4, T, B, H) * 0.3, -0.9, 0.9)
    rho = np.ones(4, np.float32)
    beta = np.full(4, 1e-6, np.float32)
    is_tanh = np.asarray([False, False, True, False])

    def objective(weights):
        pre = np.einsum('tbd,gdh->gtbh', m, weights) + fixed
        act = np.where(is_tanh[:, None, None, None], np.tanh(pre),
                       1 / (1 + np.exp(-pre)))
        data = 0.5 * rho * np.sum((act - target) ** 2, axis=(1, 2, 3))
        reg = 0.5 * beta * np.sum(weights ** 2, axis=(1, 2))
        return (data + reg).sum()

    new_w = np.asarray(gauss_newton_ridge_update(
        *map(jnp.asarray, (m, fixed, w, target)), jnp.asarray(rho),
        jnp.asarray(beta), jnp.asarray(is_tanh), lax.Precision.HIGHEST))
    assert objective(new_w) < objective(w)


def test_dual_updates_oracle():
    lam, gate, act = _r(8, 3), _r(8, 3), _r(8, 3)
    rho = np.float32(0.4)
    np.testing.assert_allclose(
        np.asarray(cf.dual_ifgo_update(*map(jnp.asarray, (lam,)), rho,
                                       jnp.asarray(gate), jnp.asarray(act))),
        lam + rho * (gate - act), atol=1e-6)

    c, f, cp, i, g = (_r(8, 3) for _ in range(5))
    np.testing.assert_allclose(
        np.asarray(cf.dual_c_update(jnp.asarray(lam), rho, jnp.asarray(c),
                                    jnp.asarray(f), jnp.asarray(cp),
                                    jnp.asarray(i), jnp.asarray(g))),
        lam + rho * (c - (f * cp + i * g)), atol=1e-6)


def test_gram_bvec_chunked_matches_einsum(monkeypatch):
    """The streamed wide-contraction Gram (the HAR-scale no-OOM path) must
    match the fused einsum to f32 reduction-order tolerance, end to end
    through the exact solve."""
    from admm_lstm_tpu.solvers import normal_eq as ne

    rng = np.random.RandomState(3)
    T, K, B, D = 3, 12, 40, 7
    s2 = jnp.asarray(rng.randn(T, K, B).astype(np.float32) ** 2)
    wres = jnp.asarray(rng.randn(T, K, B).astype(np.float32))
    m = jnp.asarray(rng.randn(T, D, B).astype(np.float32))
    prec = lax.Precision.HIGHEST

    g_ein, b_ein = ne._gram_bvec(s2, wres, m, prec)
    # Force the streamed path with several chunks (budget ~K/3 columns),
    # under BOTH large-shape strategies (pair-product and wide).
    monkeypatch.setattr(ne, '_EINSUM_MAX_ELEMS', 0)
    monkeypatch.setattr(ne, '_CHUNK_BUDGET_ELEMS', (K // 3) * D * T * B)
    for strategy in ('pair', 'wide', 'blocktri'):
        monkeypatch.setattr(ne, '_gram_strategy', lambda *a: strategy)
        g_chunk, b_chunk = ne._gram_bvec(s2, wres, m, prec)
        np.testing.assert_allclose(np.asarray(g_ein), np.asarray(g_chunk),
                                   atol=1e-4, rtol=1e-5,
                                   err_msg=strategy)
        np.testing.assert_allclose(np.asarray(b_ein), np.asarray(b_chunk),
                                   atol=1e-5, rtol=1e-5)

    # End-to-end through the wide solver: identical weights either way.
    monkeypatch.setattr(ne, '_gram_strategy',
                        lambda n_cols, dim, n_rows:
                        'wide' if n_cols * dim * n_rows > ne._EINSUM_MAX_ELEMS
                        else 'einsum')
    hidden = K // 4
    pre = jnp.asarray(rng.randn(T, K, B).astype(np.float32) * 0.3)
    w_w = jnp.asarray(rng.randn(D, K).astype(np.float32) * 0.2)
    target = jnp.asarray(rng.randn(T, K, B).astype(np.float32) * 0.3)
    rho_g = jnp.ones(4, jnp.float32)
    beta_g = jnp.full(4, 1e-6, jnp.float32)
    tanh_cols = jnp.repeat(jnp.asarray([False, False, True, False]), hidden)
    args = (m, pre, w_w, target, rho_g, beta_g, tanh_cols, prec)
    new_chunk = ne.gauss_newton_ridge_update_wide(*args)
    monkeypatch.setattr(ne, '_EINSUM_MAX_ELEMS', 1 << 25)
    new_ein = ne.gauss_newton_ridge_update_wide(*args)
    np.testing.assert_allclose(np.asarray(new_ein), np.asarray(new_chunk),
                               atol=2e-5, rtol=1e-5)


def test_gram_blocktri_ragged_blocks(monkeypatch):
    """Block-symmetric Gram with D spanning several 128-blocks plus a
    ragged tail must equal the fused einsum (upper blocks are mirrored
    transposes of MXU-computed lower blocks)."""
    from admm_lstm_tpu.solvers import normal_eq as ne

    rng = np.random.RandomState(7)
    T, K, B, D = 2, 8, 24, 300          # blocks 128 + 128 + 44
    s2 = jnp.asarray(rng.randn(T, K, B).astype(np.float32) ** 2)
    wres = jnp.asarray(rng.randn(T, K, B).astype(np.float32))
    m = jnp.asarray(rng.randn(T, D, B).astype(np.float32))
    prec = lax.Precision.HIGHEST

    g_ein, b_ein = ne._gram_bvec(s2, wres, m, prec)
    monkeypatch.setattr(ne, '_EINSUM_MAX_ELEMS', 0)
    monkeypatch.setattr(ne, '_gram_strategy', lambda *a: 'blocktri')
    g_bt, b_bt = ne._gram_bvec(s2, wres, m, prec)
    np.testing.assert_allclose(np.asarray(g_ein), np.asarray(g_bt),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b_ein), np.asarray(b_bt),
                               atol=1e-5, rtol=1e-5)
    g = np.asarray(g_bt)
    np.testing.assert_allclose(g, np.transpose(g, (0, 2, 1)), atol=1e-4)


@pytest.mark.parametrize('dim', [1, 128, 129, 257])
def test_gram_blocktri_edge_widths(monkeypatch, dim):
    """Degenerate block layouts: single partial block, exactly one full
    block, and 1-wide ragged tails (D = 129/257) must all match the
    wide path."""
    from admm_lstm_tpu.solvers import normal_eq as ne

    rng = np.random.RandomState(dim)
    T, K, B = 2, 8, 12
    s2 = jnp.asarray(rng.randn(T, K, B).astype(np.float32) ** 2)
    wres = jnp.asarray(rng.randn(T, K, B).astype(np.float32))
    m = jnp.asarray(rng.randn(T, dim, B).astype(np.float32))
    prec = lax.Precision.HIGHEST

    monkeypatch.setattr(ne, '_EINSUM_MAX_ELEMS', 0)
    monkeypatch.setattr(ne, '_gram_strategy', lambda *a: 'wide')
    g_w, b_w = ne._gram_bvec(s2, wres, m, prec)
    monkeypatch.setattr(ne, '_gram_strategy', lambda *a: 'blocktri')
    g_bt, b_bt = ne._gram_bvec(s2, wres, m, prec)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_bt),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b_w), np.asarray(b_bt),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('dim', [40, 128, 200, 301])
def test_blocked_spd_solve_matches_cho(dim):
    """The blocked batched Cholesky (the D > 128 MXU path) must match
    jax.scipy's cho_solve to reduction-order tolerance, including
    non-multiple-of-128 dims (identity padding)."""
    from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve
    rng = np.random.RandomState(dim)
    K = 6
    m = rng.randn(K, dim, dim).astype(np.float32)
    a = jnp.asarray(m @ m.transpose(0, 2, 1) + dim * np.eye(dim,
                                                            dtype=np.float32))
    b = jnp.asarray(rng.randn(K, dim).astype(np.float32))

    def solve_one(aa, bb):
        return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(aa),
                                          bb)

    ref = jax.vmap(solve_one)(a, b)
    got = blocked_spd_solve(a, b, block=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_blocked_spd_solve_pallas_diag_matches():
    """The Pallas diagonal factor+inverse path (use_pallas_diag, the
    TPU default) must match the XLA diagonal path bit-closely."""
    from admm_lstm_tpu.solvers.blocked_chol import blocked_spd_solve
    rng = np.random.RandomState(7)
    K, dim = 5, 150
    m = rng.randn(K, dim, dim).astype(np.float32)
    a = jnp.asarray(m @ m.transpose(0, 2, 1)
                    + dim * np.eye(dim, dtype=np.float32))
    b = jnp.asarray(rng.randn(K, dim).astype(np.float32))
    ref = blocked_spd_solve(a, b, block=64, use_pallas_diag=False)
    got = blocked_spd_solve(a, b, block=64, use_pallas_diag=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
