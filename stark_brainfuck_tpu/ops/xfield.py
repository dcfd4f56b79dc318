"""Cubic extension field F_{p^3} = F_p[X] / (X^3 - X + 1).

An extension element batch is a uint64 ndarray with trailing dim 3
(coefficients c0 + c1·X + c2·X^2, canonical < p). Dual-backend like
`field.py`.

Design departures from the reference (`extension_field.py:5-122`):
  - elements are fixed-width coefficient tensors, not wrapped Polynomials;
  - multiplication is an unrolled 9-product schoolbook with the closed-form
    reduction X^3 ≡ X - 1, X^4 ≡ X^2 - X (no polynomial long division);
  - inversion is closed-form via the adjugate of the multiplication matrix
    (a 3x3 linear solve) + one base-field inversion of the determinant —
    fully vectorized, replacing the reference's polynomial xgcd
    (`extension_field.py:77-81`).
"""

from __future__ import annotations

import numpy as np

from . import field as f
from .field import P

U64 = np.uint64


def from_base(a, xp=np):
    """Lift base-field array (...,) -> extension array (..., 3)."""
    z = xp.zeros(a.shape + (2,), dtype=xp.uint64)
    return xp.concatenate([a[..., None], z], axis=-1)


def scalar(c0: int, c1: int = 0, c2: int = 0, xp=np):
    return xp.asarray([c0 % P, c1 % P, c2 % P], dtype=xp.uint64)


def zeros(shape, xp=np):
    return xp.zeros(tuple(shape) + (3,), dtype=xp.uint64)


def ones(shape, xp=np):
    z = xp.zeros(tuple(shape) + (3,), dtype=xp.uint64)
    if xp is np:
        z[..., 0] = 1
        return z
    return z.at[..., 0].set(1)


def add(a, b, xp=np):
    return f.add(a, b, xp)


def sub(a, b, xp=np):
    return f.sub(a, b, xp)


def neg(a, xp=np):
    return f.neg(a, xp)


def mul(a, b, xp=np):
    """Schoolbook product then reduce by X^3 = X - 1."""
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    m = lambda x, y: f.mul(x, y, xp)
    ad = lambda x, y: f.add(x, y, xp)
    sb = lambda x, y: f.sub(x, y, xp)

    c0 = m(a0, b0)
    c1 = ad(m(a0, b1), m(a1, b0))
    c2 = ad(ad(m(a0, b2), m(a1, b1)), m(a2, b0))
    c3 = ad(m(a1, b2), m(a2, b1))
    c4 = m(a2, b2)

    # X^3 ≡ X - 1  => c3·X^3 = -c3 + c3·X
    # X^4 ≡ X^2 - X => c4·X^4 = -c4·X + c4·X^2
    r0 = sb(c0, c3)
    r1 = sb(ad(c1, c3), c4)
    r2 = ad(c2, c4)
    return xp.stack([r0, r1, r2], axis=-1)


def mul_base(a, b, xp=np):
    """Extension (...,3) times base (...,) — 3 base muls instead of 9."""
    return f.mul(a, b[..., None], xp)


def square(a, xp=np):
    return mul(a, a, xp)


def pow_const(a, exponent: int, xp=np):
    if exponent == 0:
        return ones(a.shape[:-1], xp)
    acc = None
    for bit in bin(exponent)[2:]:
        if acc is not None:
            acc = mul(acc, acc, xp)
        if bit == "1":
            acc = a if acc is None else mul(acc, a, xp)
    return acc


def inverse(a, xp=np):
    """Closed-form inverse via adjugate of the multiplication-by-a matrix.

    For a = a0 + a1·X + a2·X^2 the matrix of y -> a·y in basis {1, X, X^2} is

        M = [[a0,    -a2,      -a1    ],
             [a1,  a0 + a2,  a1 - a2  ],
             [a2,    a1,     a0 + a2  ]]

    and a^{-1} = adj(M)·e0 / det(M): only the first column of the adjugate
    (three 2x2 cofactors) and one base-field inversion are needed.
    """
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    m = lambda x, y: f.mul(x, y, xp)
    ad = lambda x, y: f.add(x, y, xp)
    sb = lambda x, y: f.sub(x, y, xp)

    s = ad(a0, a2)  # a0 + a2
    t = sb(a1, a2)  # a1 - a2

    # cofactors of the first *row* of M^T == first column of adj(M):
    # adj0 = det [[s, t], [a1, s]]        = s·s - t·a1
    # adj1 = -det [[a1, t], [a2, s]]      = -(a1·s - t·a2)
    # adj2 = det [[a1, s], [a2, a1]]      = a1·a1 - s·a2
    adj0 = sb(m(s, s), m(t, a1))
    adj1 = sb(m(t, a2), m(a1, s))
    adj2 = sb(m(a1, a1), m(s, a2))

    # Laplace along the first row: det = M[0,0]·C00 + M[0,1]·C01 + M[0,2]·C02
    # with M[0,:] = (a0, -a2, -a1) and (adj0, adj1, adj2) = (C00, C01, C02):
    det = sb(sb(m(a0, adj0), m(a2, adj1)), m(a1, adj2))
    det_inv = f.inverse(det, xp)

    return xp.stack(
        [m(adj0, det_inv), m(adj1, det_inv), m(adj2, det_inv)], axis=-1
    )


def batch_inverse(a, xp=np):
    return inverse(a, xp)


def is_zero(a, xp=np):
    return xp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# host-side scalar helpers (3-tuples of python ints)
# ---------------------------------------------------------------------------

H_ZERO = (0, 0, 0)
H_ONE = (1, 0, 0)


def h_from_base(v: int):
    return (v % P, 0, 0)


def h_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P, (a[2] + b[2]) % P)


def h_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P, (a[2] - b[2]) % P)


def h_neg(a):
    return ((-a[0]) % P, (-a[1]) % P, (-a[2]) % P)


def h_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    c0 = a0 * b0
    c1 = a0 * b1 + a1 * b0
    c2 = a0 * b2 + a1 * b1 + a2 * b0
    c3 = a1 * b2 + a2 * b1
    c4 = a2 * b2
    return ((c0 - c3) % P, (c1 + c3 - c4) % P, (c2 + c4) % P)


def h_pow(a, e: int):
    acc = H_ONE
    base = a
    while e:
        if e & 1:
            acc = h_mul(acc, base)
        base = h_mul(base, base)
        e >>= 1
    return acc


def h_inverse(a):
    a0, a1, a2 = a
    s = (a0 + a2) % P
    t = (a1 - a2) % P
    adj0 = (s * s - t * a1) % P
    adj1 = (t * a2 - a1 * s) % P
    adj2 = (a1 * a1 - s * a2) % P
    det = (a0 * adj0 - a2 * adj1 - a1 * adj2) % P
    det_inv = pow(det, P - 2, P)
    return (adj0 * det_inv % P, adj1 * det_inv % P, adj2 * det_inv % P)


def h_is_zero(a):
    return a == (0, 0, 0)


def h_sample(byte_array: bytes):
    """Hash-to-extension-field: split bytes into 3 chunks, each mod p
    (ref extension_field.py:100-111)."""
    chunk = len(byte_array) // 3
    return tuple(
        f.sample_bytes(byte_array[i * chunk : (i + 1) * chunk]) for i in range(3)
    )
