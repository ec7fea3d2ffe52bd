"""Nonlinear fixed-point system for Newton-Krylov base-flow computation.

F(X) = Phi_T(X) - X: integrate the nonlinear Navier-Stokes equations for
horizon T from X and subtract. Jacobian matvec = [exp(T J_X) - I] dx via the
linearized propagator about the frozen iterate X.

Reference parity: `nek_system`/`nek_jacobian` + `nonlinear_map`/
`jac_exptA_matvec` (/root/reference/src/systems/fixed_point.f90:4-153) and
the temperature variant fixed_point_temp.f90 (subsumed by nscal). Two
upgrades over the reference:
  * optional exact_jacobian=True computes the TRUE Jacobian of the discrete
    map via jax.jvp through the nonlinear integration (the reference can
    only freeze coefficients);
  * rmatvec is the exact discrete adjoint (linear_transpose), not a separate
    adjoint-PDE integration.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..krylov.linop import LinearOperator, NonlinearSystem
from ..krylov.space import tree_axpby
from ..mesh.core import SemMesh
from ..models.linearized import LinConfig, make_adjoint_propagator, propagate
from ..models.navier_stokes import FlowConfig, advance, initial_state
from ..ops import sem
from ..utils.timestep import cfl_dt, horizon_steps


class FixedPointSystem(NonlinearSystem):
    """F(X) = Phi_T(X) - X over vectors {u, theta}."""

    def __init__(
        self,
        mesh: SemMesh,
        cfg: LinConfig,
        tau: float,
        ub=None,
        tb=None,
        cfl: float = 0.4,
        dt: float | None = None,
        exact_jacobian: bool = False,
        precondition: bool = True,
        recycle: int = 0,
    ):
        """recycle: deflate each step's E solve against the last `recycle`
        solutions (Nek5000 residual projection) in the nonlinear map and the
        jvp/vjp Jacobian paths — autodiff differentiates through the
        stop_gradient'd basis fine; only the linear_transpose'd frozen
        adjoint stays recycle-free (models/linearized.py)."""
        self.mesh = mesh
        self.recycle = int(recycle)
        self.base_cfg = cfg
        self.tau = float(tau)
        self.ub = ub
        self.tb = tb
        self.cfl = cfl
        self._fixed_dt = dt
        self.exact_jacobian = exact_jacobian
        self._cfg_cache: dict = {}
        # ONE preconditioner serves every CFL-derived dt: E(dt) = (dt/g0) E(1)
        # exactly, and PCG is invariant to scalar scaling of the
        # preconditioner, so quality is dt-independent (precond.py).
        self.pc_e = None
        if precondition:
            from ..models.precond import build_e_preconditioner

            self.pc_e = build_e_preconditioner(mesh, 1.0)

    def _derive(self, u):
        """(cfg, nsteps) with dt from the CFL contract against iterate u."""
        dt = self._fixed_dt if self._fixed_dt is not None else cfl_dt(self.mesh, u, cfl=self.cfl)
        dt, nsteps = horizon_steps(self.tau, dt)
        key = (round(dt, 14), nsteps)
        if key not in self._cfg_cache:
            cfg = dataclasses.replace(
                self.base_cfg, flow=dataclasses.replace(self.base_cfg.flow, dt=dt)
            )
            self._cfg_cache[key] = cfg
        return self._cfg_cache[key], nsteps

    def advance_map(self, x: dict) -> dict:
        cfg, nsteps = self._derive(x["u"])
        st = initial_state(self.mesh, cfg.flow, u=x["u"], theta=x["theta"])
        out = advance(self.mesh, cfg.flow, st, nsteps, ub=self.ub, tb=self.tb,
                      pc_e=self.pc_e, recycle=self.recycle)
        return {"u": out.u, "theta": out.theta}

    def response(self, x: dict) -> dict:
        phi = self.advance_map(x)
        return tree_axpby(1.0, phi, -1.0, x)

    def jacobian(self, x: dict) -> LinearOperator:
        cfg, nsteps = self._derive(x["u"])
        if self.exact_jacobian:
            return _ExactJacobian(self, x, cfg, nsteps)
        return _FrozenJacobian(self.mesh, cfg, x, nsteps, pc_e=self.pc_e,
                               recycle=self.recycle)


class _FrozenJacobian(LinearOperator):
    """[exp(tau J_X) - I] dx with frozen base flow X (reference semantics)."""

    def __init__(self, mesh, cfg: LinConfig, x, nsteps, pc_e=None, recycle=0):
        self.mesh = mesh
        self.cfg = cfg
        self.x = x
        self.nsteps = nsteps
        self.pc_e = pc_e
        self.recycle = int(recycle)
        self._adj = None

    def matvec(self, dx):
        u, theta = propagate(
            self.mesh, self.cfg, self.x["u"], self.x["theta"], dx["u"], dx["theta"], self.nsteps,
            pc_e=self.pc_e, recycle=self.recycle,
        )
        return {"u": u - dx["u"], "theta": theta - dx["theta"]}

    def rmatvec(self, dx):
        if self._adj is None:
            self._adj = make_adjoint_propagator(
                self.mesh, self.cfg, self.x["u"], self.x["theta"], self.nsteps,
                pc_e=self.pc_e,
            )
        u, theta = self._adj(dx["u"], dx["theta"])
        return {"u": u - dx["u"], "theta": theta - dx["theta"]}


class _ExactJacobian(LinearOperator):
    """True discrete Jacobian of Phi_T - I via jax.jvp through the nonlinear
    integration (co-evolving linearization)."""

    def __init__(self, system: FixedPointSystem, x, cfg, nsteps):
        self.system = system
        self.x = x
        self.cfg = cfg
        self.nsteps = nsteps

    def _phi(self, u, theta):
        st = initial_state(self.system.mesh, self.cfg.flow, u=u, theta=theta)
        out = advance(
            self.system.mesh, self.cfg.flow, st, self.nsteps, ub=self.system.ub,
            tb=self.system.tb, pc_e=self.system.pc_e, recycle=self.system.recycle,
        )
        return out.u, out.theta

    def matvec(self, dx):
        _, (du, dth) = jax.jvp(
            self._phi, (self.x["u"], self.x["theta"]), (dx["u"], dx["theta"])
        )
        return {"u": du - dx["u"], "theta": dth - dx["theta"]}

    def rmatvec(self, dx):
        mesh = self.system.mesh
        _, vjp = jax.vjp(self._phi, self.x["u"], self.x["theta"])
        # scale-normalized cotangent seed (see models/linearized.py
        # make_adjoint_propagator: bm1-scaled seeds otherwise run the
        # transposed ABSOLUTE-tolerance inner solves orders of magnitude
        # looser than the forward)
        iu, it_ = mesh.bm1 * dx["u"], mesh.bm1 * dx["theta"]
        nv = jnp.sqrt(jnp.sum(dx["u"] ** 2) + jnp.sum(dx["theta"] ** 2))
        ni = jnp.sqrt(jnp.sum(iu * iu) + jnp.sum(it_ * it_))
        c = jnp.where(ni > 0, nv / jnp.maximum(ni, 1e-300), 1.0)
        wu, wt = vjp((c * iu, c * it_))
        au = mesh.vmask * mesh.binv * sem.dssum(mesh, wu) / c
        at = mesh.tmask * mesh.binv * sem.dssum(mesh, wt) / c
        return {"u": au - dx["u"], "theta": at - dx["theta"]}
