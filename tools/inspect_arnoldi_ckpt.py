"""Inspect a running eigs Arnoldi checkpoint: projected Ritz values and the
Arnoldi residual bounds, WITHOUT any extra matvecs.

For an Arnoldi factorization A V_k = V_k H_k + h_{k+1,k} v_{k+1} e_k^T, each
Ritz pair (mu, y) of H_k has EXACT residual ||A x - mu x|| = h_{k+1,k} |y_k|
(x = V_k y, B-orthonormal basis), so the leading pair's certificate can be
read off the checkpoint mid-flight.

Usage: python tools/inspect_arnoldi_ckpt.py artifacts/ckpt_adj_f64.npz
"""

import sys

import numpy as np


def main():
    path = sys.argv[1]
    with np.load(path) as z:
        H = np.asarray(z["H"])
        vk = int(z["vk"])
        n_mv = int(z["n_mv"])
        fp = str(z["fingerprint"])
    k = vk - 1  # valid Arnoldi columns
    print(f"{path}: {vk} basis slots, {k} valid columns, {n_mv} matvecs, fp={fp}")
    if k < 2:
        return
    Hk = H[:k, :k]
    beta = H[k, k - 1]
    evals, evecs = np.linalg.eig(Hk)
    order = np.argsort(-np.abs(evals))
    print(f"subdiagonal h(k+1,k) = {beta:.3e}")
    for i in order[:6]:
        mu = evals[i]
        res = abs(beta * evecs[k - 1, i])
        lam = np.log(complex(mu))
        print(f"  mu = {mu.real:+.8f} {mu.imag:+.8f}i  |mu| = {abs(mu):.8f}  "
              f"residual = {res:.3e}  (lambda = {lam.real:+.6f} {lam.imag:+.6f}i)")


if __name__ == "__main__":
    main()
