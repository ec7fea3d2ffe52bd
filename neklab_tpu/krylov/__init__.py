"""Krylov layer: the framework's LightKrylov equivalent (SURVEY layer 1).

Abstract pytree vector space + matrix-free algorithms: Krylov-Schur Arnoldi
eigensolver, Lanczos-bidiagonalization SVD, restarted GMRES, CG, and inexact
Newton-Krylov with tolerance schedulers.
"""

from .space import (
    KrylovBasis,
    VectorSpace,
    euclidean_space,
    tree_add,
    tree_axpby,
    tree_scale,
    tree_sub,
    tree_zeros_like,
)
from .linop import AdjointOperator, FunctionOperator, LinearOperator, NonlinearSystem
from .eigs import EigsResult, eigs
from .svd import SvdsResult, svds
from .gmres import GmresResult, cg, fgmres, gmres
from .newton import NewtonResult, constant_tol, dynamic_tol, newton

__all__ = [
    "KrylovBasis",
    "VectorSpace",
    "euclidean_space",
    "tree_add",
    "tree_axpby",
    "tree_scale",
    "tree_sub",
    "tree_zeros_like",
    "AdjointOperator",
    "FunctionOperator",
    "LinearOperator",
    "NonlinearSystem",
    "EigsResult",
    "eigs",
    "SvdsResult",
    "svds",
    "GmresResult",
    "cg",
    "fgmres",
    "gmres",
    "NewtonResult",
    "constant_tol",
    "dynamic_tol",
    "newton",
]
