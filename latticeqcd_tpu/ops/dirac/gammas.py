"""Euclidean gamma matrices (hermitian, {g_mu, g_nu} = 2 delta).

DeGrand-Rossi chiral basis; gamma5 = g1 g2 g3 g4 = diag(1,1,-1,-1).
Physics observables (plaquette, pion correlator, condensates) are
basis independent, so parity with LatticeDiracOperators.jl does not
require its exact basis — hermiticity g5 D g5 = D^dag is verified in
tests/test_dirac.py.
"""

import numpy as np

_i = 1j

GAMMA = np.zeros((4, 4, 4), dtype=np.complex128)
# gamma_1 (x)
GAMMA[0] = [[0, 0, 0, _i], [0, 0, _i, 0], [0, -_i, 0, 0], [-_i, 0, 0, 0]]
# gamma_2 (y)
GAMMA[1] = [[0, 0, 0, -1], [0, 0, 1, 0], [0, 1, 0, 0], [-1, 0, 0, 0]]
# gamma_3 (z)
GAMMA[2] = [[0, 0, _i, 0], [0, 0, 0, -_i], [-_i, 0, 0, 0], [0, _i, 0, 0]]
# gamma_4 (t)
GAMMA[3] = [[0, 0, 1, 0], [0, 0, 0, 1], [1, 0, 0, 0], [0, 1, 0, 0]]

GAMMA5 = np.diag([1.0, 1.0, -1.0, -1.0]).astype(np.complex128)

ID4 = np.eye(4, dtype=np.complex128)

# hopping projectors P^-_mu = (r - gamma_mu), P^+_mu = (r + gamma_mu) at r=1
def projectors(r: float = 1.0):
    pm = np.stack([r * ID4 - GAMMA[mu] for mu in range(4)])
    pp = np.stack([r * ID4 + GAMMA[mu] for mu in range(4)])
    return pm, pp


def _half_factor(p):
    """V (4x2) with p = 2 V V^dag for a rank-2 projector-like 2*P."""
    w, v = np.linalg.eigh(p)
    idx = np.argsort(w)[::-1][:2]
    assert np.allclose(sorted(w), [0, 0, 2, 2]), w
    return v[:, idx] * np.sqrt(w[idx] / 2.0)[None, :]


def half_spinor_factors():
    """Spin-projection decomposition at r=1 (the QPhiX/Grid trick):
    (1 -+ gamma_mu) = 2 V V^dag with V (4x2); the color multiply then
    acts on 2 spin components instead of 4, halving the D-slash color
    flops. Returns (Vm[4,4,2], Vp[4,4,2]), verified exact at import.
    """
    pm, pp = projectors(1.0)
    vm = np.stack([_half_factor(pm[mu]) for mu in range(4)])
    vp = np.stack([_half_factor(pp[mu]) for mu in range(4)])
    for mu in range(4):
        assert np.allclose(2 * vm[mu] @ vm[mu].conj().T, pm[mu])
        assert np.allclose(2 * vp[mu] @ vp[mu].conj().T, pp[mu])
    return vm, vp


def _selfcheck():
    for mu in range(4):
        assert np.allclose(GAMMA[mu], GAMMA[mu].conj().T)
        for nu in range(4):
            anti = GAMMA[mu] @ GAMMA[nu] + GAMMA[nu] @ GAMMA[mu]
            assert np.allclose(anti, 2 * (mu == nu) * ID4)
    g5 = GAMMA[0] @ GAMMA[1] @ GAMMA[2] @ GAMMA[3]
    assert np.allclose(g5, GAMMA5)


_selfcheck()
