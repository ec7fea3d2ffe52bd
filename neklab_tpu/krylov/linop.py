"""Abstract linear operator / nonlinear system interfaces.

Mirrors LightKrylov's `abstract_linop_rdp` / `abstract_system_rdp` hierarchy
(the layer the reference builds its exptA/resolvent/Jacobian types on — see
SURVEY section 1, layer 1) as plain Python classes over pytree vectors.
"""

from __future__ import annotations

from typing import Any, Callable

Vector = Any


class LinearOperator:
    """Matrix-free linear operator. Subclasses implement matvec (and rmatvec
    for adjoint-requiring algorithms: svds, adjoint eigs)."""

    def matvec(self, x: Vector) -> Vector:
        raise NotImplementedError

    def rmatvec(self, x: Vector) -> Vector:
        raise NotImplementedError

    def apply(self, x: Vector, adjoint: bool = False) -> Vector:
        return self.rmatvec(x) if adjoint else self.matvec(x)


class FunctionOperator(LinearOperator):
    def __init__(self, matvec: Callable, rmatvec: Callable | None = None):
        self._mv = matvec
        self._rmv = rmatvec

    def matvec(self, x):
        return self._mv(x)

    def rmatvec(self, x):
        if self._rmv is None:
            raise NotImplementedError("no rmatvec supplied")
        return self._rmv(x)


class AdjointOperator(LinearOperator):
    def __init__(self, op: LinearOperator):
        self.op = op

    def matvec(self, x):
        return self.op.rmatvec(x)

    def rmatvec(self, x):
        return self.op.matvec(x)


class NonlinearSystem:
    """F(x) evaluation + Jacobian linop about a base point, for Newton-Krylov.

    Mirrors `abstract_system_rdp` + `abstract_jacobian_linop_rdp`
    (/root/reference/src/systems/neklab_systems.f90:42-56).
    """

    def response(self, x: Vector) -> Vector:
        raise NotImplementedError

    def jacobian(self, x: Vector) -> LinearOperator:
        raise NotImplementedError
