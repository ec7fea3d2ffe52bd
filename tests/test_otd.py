"""OTD mode evolution test: for a steady base flow the OTD subspace converges
to the span of the leading eigenvectors and eig(Lr) to the leading
eigenvalues of the linearized operator (here: the analytic Poiseuille shear
modes -nu (m pi/2)^2; the m=1,2 modes lead at Re=100, the OS pair is third).

Analog of the reference's examples/poiseuille/OTD_steady case (SURVEY 3.5)
with an analytic oracle instead of eyeballed plots."""

import numpy as np
import jax.numpy as jnp

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig, initial_state
from neklab_tpu.otd import OtdOpts, apply_l, otd_analysis
from neklab_tpu.models.linearized import pert_initial
from neklab_tpu.ops import sem

RE = 100.0


def _setup(order):
    mesh = box_mesh(
        (3, 4), ((0, 2 * np.pi), (-1, 1)), {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=order,
    )
    fc = FlowConfig(viscosity=1 / RE, dt=0.06, vtol=1e-11, ptol=1e-11)
    return mesh, LinConfig(flow=fc)


def test_apply_l_rayleigh_quotient():
    mesh, cfg = _setup(order=5)
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    th = jnp.zeros((0,) + mesh.bm1.shape)
    umode = jnp.stack([jnp.cos(np.pi * y / 2), 0 * y])
    st = pert_initial(mesh, cfg, umode)
    lu = apply_l(mesh, cfg, U, th, st)
    rq = float(sem.mass_dot(mesh, umode, lu) / sem.mass_dot(mesh, umode, umode))
    assert abs(rq - (-(1 / RE) * (np.pi / 2) ** 2)) < 1e-10


def test_otd_converges_to_leading_modes():
    mesh, cfg = _setup(order=4)
    y = mesh.x[1]
    base = initial_state(mesh, cfg.flow, u=jnp.stack([1 - y**2, 0 * y]))
    opts = OtdOpts(r=2, printstep=100, solve_baseflow=False)
    res = otd_analysis(mesh, cfg, opts, base, nsteps=2600)
    lam = np.sort(res.eigvals_lr.real)[::-1]
    exact = np.array([-(1 / RE) * (np.pi / 2) ** 2, -(1 / RE) * np.pi**2])
    assert abs(lam[0] - exact[0]) < 5e-4, (lam, exact)
    assert abs(lam[1] - exact[1]) < 5e-3, (lam, exact)
    # reduced operators were logged every chunk
    assert len(res.lr_history) == 26
