"""Dense-matrix unit tests for the Krylov layer — the suite the reference
outsources to LightKrylov's `fpm test` (SURVEY section 4)."""

import numpy as np
import jax.numpy as jnp

from neklab_tpu.krylov import (
    FunctionOperator,
    NonlinearSystem,
    cg,
    constant_tol,
    dynamic_tol,
    eigs,
    euclidean_space,
    gmres,
    newton,
    svds,
)


def _mat_op(a: np.ndarray) -> FunctionOperator:
    aj = jnp.asarray(a)
    return FunctionOperator(
        matvec=lambda x: aj @ x,
        rmatvec=lambda x: aj.T @ x,
    )


def _spectrum_matrix(n: int, eigvals: np.ndarray, seed=0) -> np.ndarray:
    """Real matrix with prescribed (conjugate-closed) spectrum."""
    rng = np.random.default_rng(seed)
    blocks = []
    used = 0
    i = 0
    while used < n:
        ev = eigvals[i]
        if ev.imag > 1e-14:
            # one 2x2 block represents the conjugate PAIR; the explicitly
            # listed conjugate partner (negative imag) is skipped below
            blocks.append(np.array([[ev.real, ev.imag], [-ev.imag, ev.real]]))
            used += 2
        elif ev.imag < -1e-14:
            pass  # conjugate partner of an already-emitted block
        else:
            blocks.append(np.array([[ev.real]]))
            used += 1
        i += 1
    d = np.zeros((n, n))
    o = 0
    for b in blocks:
        k = b.shape[0]
        d[o : o + k, o : o + k] = b
        o += k
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return q @ d @ q.T


def test_eigs_dense():
    n = 120
    lead = np.array([2.0, 1.5 + 0.5j, 1.5 - 0.5j, 1.2, -1.1])
    rest = np.linspace(0.9, -0.9, n - 5)
    a = _spectrum_matrix(n, np.concatenate([lead, rest]))
    space = euclidean_space(rand_template=jnp.zeros(n))
    res = eigs(_mat_op(a), space, nev=4, kdim=30, tol=1e-9, maxiter=60)
    assert res.converged.all()
    got = np.sort_complex(res.eigvals)
    want = np.sort_complex(np.array([2.0, 1.5 + 0.5j, 1.5 - 0.5j, 1.2]))
    assert np.max(np.abs(got - want)) < 1e-7
    # basis orthonormality
    V = np.stack([np.asarray(res.basis[j]) for j in range(10)])
    g = V @ V.T
    assert np.max(np.abs(g - np.eye(10))) < 1e-10
    # eigenvector residuals ||A x - lambda x||
    for lam, x in zip(res.eigvals, res.eigenvectors()):
        xv = np.asarray(x)
        assert np.linalg.norm(a @ xv - lam * xv) / np.linalg.norm(xv) < 1e-6


def test_eigs_adjoint():
    n = 80
    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n)) / np.sqrt(n)
    space = euclidean_space(rand_template=jnp.zeros(n))
    direct = eigs(_mat_op(a), space, nev=3, kdim=40, tol=1e-8, maxiter=50)
    adj = eigs(_mat_op(a), space, nev=3, kdim=40, tol=1e-8, maxiter=50, adjoint=True)
    # spectrum of A^T equals spectrum of A
    d = np.sort_complex(direct.eigvals)
    ad = np.sort_complex(adj.eigvals)
    assert np.max(np.abs(d - ad)) < 1e-6


def test_svds_dense():
    m = 90
    rng = np.random.default_rng(1)
    a = rng.standard_normal((m, m))
    space = euclidean_space(rand_template=jnp.zeros(m))
    res = svds(_mat_op(a), space, nsv=5, kdim=60, tol=1e-10)
    want = np.linalg.svd(a, compute_uv=False)[:5]
    assert np.max(np.abs(res.s - want) / want) < 1e-8
    # triplet consistency: A v = s u
    for s, u, v in zip(res.s, res.left_vectors(), res.right_vectors()):
        uv, vv = np.asarray(u), np.asarray(v)
        assert np.linalg.norm(a @ vv - s * uv) < 1e-6 * s


def test_gmres_dense():
    n = 100
    rng = np.random.default_rng(5)
    a = np.eye(n) + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal(n)
    space = euclidean_space()
    sol = gmres(_mat_op(a), jnp.asarray(b), space, kdim=40, rtol=1e-10, max_restarts=10)
    assert sol.converged
    assert np.linalg.norm(a @ np.asarray(sol.x) - b) < 1e-8
    # adjoint solve
    sol_t = gmres(_mat_op(a), jnp.asarray(b), space, kdim=40, rtol=1e-10, adjoint=True)
    assert np.linalg.norm(a.T @ np.asarray(sol_t.x) - b) < 1e-8


def test_cg_dense():
    n = 60
    rng = np.random.default_rng(7)
    q = rng.standard_normal((n, n))
    a = q @ q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    space = euclidean_space()
    sol = cg(_mat_op(a), jnp.asarray(b), space, rtol=1e-12)
    assert sol.converged
    assert np.linalg.norm(a @ np.asarray(sol.x) - b) < 1e-8


class _Quadratic(NonlinearSystem):
    """F(x) = A x + eps * x.^2 - b, Jacobian A + 2 eps diag(x)."""

    def __init__(self, a, b, eps=0.1):
        self.a, self.b, self.eps = a, b, eps

    def response(self, x):
        return self.a @ x + self.eps * x**2 - self.b

    def jacobian(self, x):
        aj = self.a + 2 * self.eps * jnp.diag(x)
        return FunctionOperator(matvec=lambda v: aj @ v, rmatvec=lambda v: aj.T @ v)


def test_newton_dense():
    n = 40
    rng = np.random.default_rng(11)
    a = jnp.asarray(np.eye(n) * 2 + 0.1 * rng.standard_normal((n, n)))
    b = jnp.asarray(rng.standard_normal(n))
    sys = _Quadratic(a, b)
    space = euclidean_space()
    for sched in (constant_tol(1e-12), dynamic_tol(1e-12)):
        res = newton(sys, jnp.zeros(n), space, tol=1e-10, maxiter=20, scheduler=sched)
        assert res.converged
        assert res.residual_norm < 1e-10
        # superlinear convergence: few iterations, strictly decreasing tail
        assert res.iterations <= 8
        assert all(b < a for a, b in zip(res.history, res.history[1:]))


def test_eigs_checkpoint_resume(tmp_path):
    """Kill-and-resume: an eigensolve interrupted mid-run continues from its
    checkpoint file and reproduces the uninterrupted spectrum exactly
    (VERDICT/SURVEY checkpoint tier 2 — Krylov restart vectors)."""
    n = 100
    lead = np.array([2.0, 1.4 + 0.3j, 1.4 - 0.3j, 1.1])
    rest = np.linspace(0.7, -0.7, n - 4)
    a = _spectrum_matrix(n, np.concatenate([lead, rest]), seed=4)
    op = _mat_op(a)
    space = euclidean_space(rand_template=jnp.zeros(n))

    ckpt = str(tmp_path / "arnoldi.npz")

    # uninterrupted reference solve
    full = eigs(op, space, nev=3, kdim=24, tol=1e-9, maxiter=10, seed=2)

    # interrupted run: abort after 10 matvecs via a poison operator
    class Poison(Exception):
        pass

    calls = {"n": 0}

    def poisoned(x):
        if calls["n"] >= 10:
            raise Poison()
        calls["n"] += 1
        return op.matvec(x)

    from neklab_tpu.krylov import FunctionOperator

    pop = FunctionOperator(matvec=poisoned, rmatvec=op.rmatvec)
    try:
        eigs(pop, space, nev=3, kdim=24, tol=1e-9, maxiter=10, seed=2,
             checkpoint=ckpt, checkpoint_every=4)
        raise AssertionError("poison operator should have fired")
    except Poison:
        pass
    import os

    assert os.path.exists(ckpt)

    # resume with the REAL operator from the checkpoint
    res = eigs(op, space, nev=3, kdim=24, tol=1e-9, maxiter=10, seed=2,
               checkpoint=ckpt, checkpoint_every=4)
    assert res.converged.all()
    # fewer matvecs REMAINING than a fresh solve needs in total
    assert res.n_matvec <= full.n_matvec
    ev_full = np.sort_complex(full.eigvals)
    ev_res = np.sort_complex(res.eigvals)
    assert np.allclose(ev_full, ev_res, atol=1e-8), (ev_full, ev_res)


def test_svds_checkpoint_resume(tmp_path):
    """Lanczos kill-and-resume reproduces the uninterrupted singular values."""
    rng = np.random.default_rng(8)
    n = 90
    a = rng.standard_normal((n, n)) / np.sqrt(n)
    a[0, 0] += 3.0  # dominant direction
    op = _mat_op(a)
    space = euclidean_space(rand_template=jnp.zeros(n))
    full = svds(op, space, nsv=3, kdim=30, tol=1e-10, seed=3)

    ckpt = str(tmp_path / "lanczos.npz")

    class Poison(Exception):
        pass

    calls = {"n": 0}

    def poisoned(x):
        if calls["n"] >= 9:
            raise Poison()
        calls["n"] += 1
        return op.matvec(x)

    from neklab_tpu.krylov import FunctionOperator

    pop = FunctionOperator(matvec=poisoned, rmatvec=op.rmatvec)
    try:
        svds(pop, space, nsv=3, kdim=30, tol=1e-10, seed=3,
             checkpoint=ckpt, checkpoint_every=2)
        raise AssertionError("poison should have fired")
    except Poison:
        pass
    res = svds(op, space, nsv=3, kdim=30, tol=1e-10, seed=3,
               checkpoint=ckpt, checkpoint_every=2)
    assert np.allclose(res.s, full.s, atol=1e-9), (res.s, full.s)


def test_fgmres_dense_variable_preconditioner():
    """fgmres converges with an iteration-VARYING right preconditioner (the
    case plain right-preconditioned GMRES cannot handle) and reduces to gmres
    when precond=None. Reference: LightKrylov fgmres (facade export, imported
    by resolvent.f90:3)."""
    from neklab_tpu.krylov import fgmres

    n = 80
    rng = np.random.default_rng(11)
    a = np.eye(n) + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n)
    b = rng.standard_normal(n)
    space = euclidean_space()
    d = np.abs(np.diag(a)) + 0.5
    calls = [0]

    def wobbly_precond(v):
        # different (random-strength Jacobi) preconditioner every call
        calls[0] += 1
        w = 1.0 + 0.3 * np.sin(calls[0])
        return jnp.asarray(np.asarray(v) / (d ** w))

    sol = fgmres(_mat_op(a), jnp.asarray(b), space, precond=wobbly_precond,
                 kdim=40, rtol=1e-10, max_restarts=10)
    assert sol.converged and calls[0] > 0
    assert np.linalg.norm(a @ np.asarray(sol.x) - b) < 1e-8
    sol0 = fgmres(_mat_op(a), jnp.asarray(b), space, kdim=40, rtol=1e-10)
    assert sol0.converged
    assert np.linalg.norm(a @ np.asarray(sol0.x) - b) < 1e-8


def test_eigs_locking_early_exit_nonnormal_accuracy():
    """Locking + early expansion stop must reproduce the full-cycle Ritz
    values on a NON-NORMAL operator at the <= 0.1*tol-of-each-other level —
    the regime of the cylinder adjoint parity runs (eigenvalue condition
    ~40, VERDICT r3 weak #8)."""
    rng = np.random.default_rng(7)
    n = 160
    lead = np.array([1.6, 1.1 + 0.7j, 1.1 - 0.7j, 0.9])
    rest = 0.3 * rng.uniform(-1.0, 1.0, n - len(lead))  # tail stays below 0.9
    a0 = _spectrum_matrix(n, np.concatenate([lead, rest.astype(complex)]), seed=3)
    # non-normality: similarity transform with condition ~40
    u, sv, vt = np.linalg.svd(rng.standard_normal((n, n)))
    sv = np.linspace(1.0, 40.0, n)
    s = (u * sv) @ vt
    a = s @ a0 @ np.linalg.inv(s)
    tol = 1e-8
    kwargs = dict(nev=4, kdim=80, tol=tol, maxiter=30, seed=5)
    space = euclidean_space(jnp.zeros(n))
    r_fast = eigs(_mat_op(a), space, check_every=8, **kwargs)   # locking+early exit
    r_full = eigs(_mat_op(a), space, check_every=0, **kwargs)   # full cycles
    assert r_fast.converged.all() and r_full.converged.all()
    ev_fast = np.sort_complex(r_fast.eigvals)
    ev_full = np.sort_complex(r_full.eigvals)
    assert np.abs(ev_fast - ev_full).max() < 0.1 * tol * 40, (
        np.abs(ev_fast - ev_full).max())
    # and both sit on the true spectrum to within kappa * tol
    true_lead = np.sort_complex(lead.astype(complex))
    assert np.abs(np.sort_complex(r_fast.eigvals) - true_lead).max() < 40 * tol * 10


def test_eigs_checkpoint_kept_on_unconverged(tmp_path):
    """An eigensolve that exhausts maxiter keeps its factorization on disk
    and can be RESUMED with a larger budget (ADVICE r3: deleting it loses a
    kdim x O(1000)-step investment)."""
    a = _spectrum_matrix(80, np.linspace(1.0, 2.0, 80).astype(complex), seed=1)
    space = euclidean_space(jnp.zeros(80))
    ckpt = str(tmp_path / "arn.npz")
    # clustered spectrum + tiny kdim: one cycle cannot converge
    r1 = eigs(_mat_op(a), space, nev=2, kdim=8, tol=1e-12, maxiter=1,
              checkpoint=ckpt, seed=2)
    assert not r1.converged.all()
    assert (tmp_path / "arn.npz").exists(), "checkpoint must survive budget exhaustion"
    r2 = eigs(_mat_op(a), space, nev=2, kdim=8, tol=1e-8, maxiter=60,
              checkpoint=ckpt, seed=2)
    assert r2.converged.all()
    assert not (tmp_path / "arn.npz").exists(), "checkpoint deleted on success"
    assert abs(abs(r2.eigvals[0]) - 2.0) < 1e-6


def test_eigs_hard_breakdown_small_invariant_subspace():
    """Hard Arnoldi breakdown with rand_fn=None in a 2-dimensional invariant
    subspace: eigs must return the exact invariant-subspace spectrum instead
    of building a degenerate restart (ADVICE r3 low #2)."""
    rng = np.random.default_rng(11)
    q, _ = np.linalg.qr(rng.standard_normal((30, 30)))
    a = (q[:, :2] * np.array([3.0, 2.0])) @ q[:, :2].T
    v0 = jnp.asarray(q[:, 0] + 0.5 * q[:, 1])
    space = euclidean_space()  # rand_fn=None: breakdown cannot be refreshed
    # tol unreachable => conv not all() on any float criterion is avoided by
    # the tiny residual; force the restart path with an absurd tolerance
    r = eigs(_mat_op(a), space, nev=2, kdim=10, tol=1e-30, maxiter=5, v0=v0)
    ev = np.sort(r.eigvals.real)[::-1]
    assert abs(ev[0] - 3.0) < 1e-10 and abs(ev[1] - 2.0) < 1e-10
