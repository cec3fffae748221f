"""BDF integrator unit tests (Robertson stiff problem + basics)."""

import jax
import jax.numpy as jnp
import numpy as np

from rac2d_tpu.ops.bdf import bdf_solve, interpolate, log_output_times


def _robertson():
    def f(y):
        return jnp.array([
            -0.04 * y[0] + 1e4 * y[1] * y[2],
            0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
            3e7 * y[1] ** 2])

    def jac(y):
        return jnp.array([
            [-0.04, 1e4 * y[2], 1e4 * y[1]],
            [0.04, -1e4 * y[2] - 6e7 * y[1], -1e4 * y[1]],
            [0.0, 6e7 * y[1], 0.0]])

    return f, jac


def test_robertson_against_scipy():
    from scipy.integrate import solve_ivp
    f, jac = _robertson()
    touts = jnp.asarray(np.logspace(-5, 5, 20))
    y0 = jnp.array([1.0, 0.0, 0.0])
    rtol = jnp.full(3, 1e-6)
    atol = jnp.full(3, 1e-10)
    res = jax.jit(lambda y: bdf_solve(f, jac, y, 0.0, touts, rtol, atol,
                                      1e-6))(y0)
    assert not bool(res.fail)
    assert float(res.t_final) == 1e5
    sol = solve_ivp(lambda t, y: np.asarray(f(jnp.asarray(y))), (0, 1e5),
                    np.asarray(y0), method="BDF", rtol=1e-10, atol=1e-14,
                    t_eval=np.asarray(touts),
                    jac=lambda t, y: np.asarray(jac(jnp.asarray(y))))
    # error bounded by a modest multiple of the requested tolerance
    ref = sol.y.T
    bound = 10.0 * (1e-6 * np.abs(ref) + 1e-10)
    assert (np.abs(np.asarray(res.ys) - ref) < bound).all()


def test_batched_vmap():
    f, jac = _robertson()
    touts = jnp.asarray(np.logspace(-3, 3, 8))
    rtol = jnp.full(3, 1e-5)
    atol = jnp.full(3, 1e-10)
    y0s = jnp.stack([jnp.array([1.0, 0.0, 0.0]),
                     jnp.array([0.9, 0.0, 0.1])])
    res = jax.vmap(lambda y: bdf_solve(f, jac, y, 0.0, touts, rtol, atol,
                                       1e-6))(y0s)
    assert res.ys.shape == (2, 8, 3)
    assert not bool(res.fail.any())
    # mass conservation per lane
    total = np.asarray(res.ys).sum(-1)
    assert np.abs(total[0] - 1.0).max() < 1e-8
    assert np.abs(total[1] - 1.0).max() < 1e-8


def test_linear_decay_exact():
    lam = 2.5

    def f(y):
        return -lam * y

    def jac(y):
        return jnp.array([[-lam]])

    touts = jnp.asarray([0.5, 1.0, 2.0])
    res = bdf_solve(f, jac, jnp.array([1.0]), 0.0, touts,
                    jnp.full(1, 1e-8), jnp.full(1, 1e-12), 1e-4)
    expected = np.exp(-lam * np.asarray(touts))
    assert np.abs(np.asarray(res.ys)[:, 0] - expected).max() < 1e-6


def test_log_output_times():
    ts = log_output_times(1e-8, 1e6, 1.1)
    assert ts[0] == 1e-8
    assert ts[-1] == 1e6
    assert len(ts) > 300


def test_batch_matches_single():
    from rac2d_tpu.ops.bdf import bdf_solve_batch
    f, jac = _robertson()
    B = 4
    f_b = lambda y, a: jax.vmap(f)(y)
    jac_b = lambda y, a: jax.vmap(jac)(y)
    touts = jnp.asarray(np.logspace(-3, 3, 8))
    rtol = jnp.full(3, 1e-6)
    atol = jnp.full(3, 1e-10)
    y0 = jnp.array([1.0, 0.0, 0.0])
    res1 = bdf_solve(f, jac, y0, 0.0, touts, rtol, atol, 1e-6)
    y0b = jnp.tile(y0, (B, 1))
    resb = bdf_solve_batch(f_b, jac_b, y0b, 0.0, touts,
                           jnp.tile(rtol, (B, 1)), jnp.tile(atol, (B, 1)),
                           1e-6)
    assert resb.ys.shape == (B, 8, 3)
    assert not bool(resb.fail.any())
    # all batch lanes agree with each other and with the single solver to
    # within the requested tolerance
    ref = np.asarray(res1.ys)
    for b in range(B):
        d = np.abs(np.asarray(resb.ys[b]) - ref)
        assert (d < 50 * (1e-6 * np.abs(ref) + 1e-10)).all()


def test_host_loop_matches_scan():
    """bdf_solve_batch_host (one device call per record interval) gives
    exactly the same results as the scan-driven bdf_solve_batch."""
    from rac2d_tpu.ops.bdf import bdf_solve_batch, bdf_solve_batch_host
    f, jac = _robertson()
    B = 3
    f_b = lambda y, a: jax.vmap(f)(y)
    jac_b = lambda y, a: jax.vmap(jac)(y)
    touts = jnp.asarray(np.logspace(-3, 3, 6))
    rtol = jnp.tile(jnp.full(3, 1e-6), (B, 1))
    atol = jnp.tile(jnp.full(3, 1e-10), (B, 1))
    y0b = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (B, 1))
    r1 = bdf_solve_batch(f_b, jac_b, y0b, 0.0, touts, rtol, atol, 1e-6)
    seen = []
    r2 = bdf_solve_batch_host(f_b, jac_b, y0b, 0.0, touts, rtol, atol,
                              1e-6, progress_cb=lambda i, s: seen.append(i))
    assert seen == list(range(6))
    assert not bool(r2.fail.any())
    np.testing.assert_allclose(np.asarray(r1.ys), np.asarray(r2.ys),
                               rtol=1e-12, atol=0)
    np.testing.assert_array_equal(np.asarray(r1.n_steps),
                                  np.asarray(r2.n_steps))


def test_continuous_matches_record():
    """The per-lane continuous-recording driver (bdf_solve_batch_cont)
    reproduces the interval-barrier driver's records within tolerance.
    Trajectories are not bit-identical: the batch-global J/LU refresh
    couples lanes differently when none pause at touts."""
    from rac2d_tpu.ops.bdf import bdf_solve_batch, bdf_solve_batch_cont
    f, jac = _robertson()
    B = 4
    f_b = lambda y, a: jax.vmap(f)(y)
    jac_b = lambda y, a: jax.vmap(jac)(y)
    touts = jnp.asarray(np.logspace(-3, 3, 8))
    rtol = jnp.tile(jnp.full(3, 1e-6), (B, 1))
    atol = jnp.tile(jnp.full(3, 1e-10), (B, 1))
    # different initial conditions -> different per-lane step sequences
    y0b = jnp.stack([jnp.array([1.0, 0.0, 0.0]),
                     jnp.array([0.7, 0.2, 0.1]),
                     jnp.array([0.5, 0.0, 0.5]),
                     jnp.array([0.9, 0.05, 0.05])])
    r1 = bdf_solve_batch(f_b, jac_b, y0b, 0.0, touts, rtol, atol, 1e-6)
    r2 = bdf_solve_batch_cont(f_b, jac_b, y0b, 0.0, touts, rtol, atol,
                              1e-6, rounds_per_call=64)
    assert r2.ys.shape == r1.ys.shape
    assert not bool(r2.fail.any())
    np.testing.assert_allclose(np.asarray(r2.ts), np.asarray(r1.ts),
                               rtol=0, atol=0)
    d = np.abs(np.asarray(r2.ys) - np.asarray(r1.ys))
    tol = 100 * (1e-6 * np.abs(np.asarray(r1.ys)) + 1e-10)
    assert (d < tol).all(), d.max()


def test_continuous_budget_guard():
    """A lane that cannot reach its next tout within the per-lane round
    budget is marked failed; healthy lanes finish."""
    from rac2d_tpu.ops.bdf import bdf_solve_batch_cont
    f, jac = _robertson()
    B = 2
    f_b = lambda y, a: jax.vmap(f)(y)
    jac_b = lambda y, a: jax.vmap(jac)(y)
    touts = jnp.asarray(np.logspace(-3, 3, 6))
    rtol = jnp.tile(jnp.full(3, 1e-6), (B, 1))
    atol = jnp.tile(jnp.full(3, 1e-10), (B, 1))
    y0b = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (B, 1))
    r = bdf_solve_batch_cont(f_b, jac_b, y0b, 0.0, touts, rtol, atol,
                             1e-6, max_steps_per_interval=3,
                             rounds_per_call=32)
    assert bool(r.fail.all())   # 3 rounds/tout cannot integrate Robertson
    r2 = bdf_solve_batch_cont(f_b, jac_b, y0b, 0.0, touts, rtol, atol,
                              1e-6, max_steps_per_interval=2000,
                              rounds_per_call=32)
    assert not bool(r2.fail.any())


def test_host_loop_wall_clock_guard():
    """With an exhausted wall budget the host loop marks unfinished lanes
    failed instead of burning the full interval ladder (reference
    'Premature finish', src/chemistry.f90:480-491)."""
    from rac2d_tpu.ops.bdf import bdf_solve_batch_host
    f, jac = _robertson()
    f_b = lambda y, a: jax.vmap(f)(y)
    jac_b = lambda y, a: jax.vmap(jac)(y)
    touts = jnp.asarray(np.logspace(-3, 3, 6))
    rtol = jnp.tile(jnp.full(3, 1e-6), (1, 1))
    atol = jnp.tile(jnp.full(3, 1e-10), (1, 1))
    y0b = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (1, 1))
    r = bdf_solve_batch_host(f_b, jac_b, y0b, 0.0, touts, rtol, atol,
                             1e-6, max_wall_s=0.0)
    assert bool(r.fail.all())
    assert r.ys.shape == (1, 6, 3)
