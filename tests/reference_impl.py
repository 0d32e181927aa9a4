"""Plain NumPy scalar-loop oracles for the stencil kernels.

Independent re-statements of the operator math (written from the equations,
used only by tests): L(u) = alpha*a*u - beta*b*Lap(u) with the 7-point
Laplacian; GSRB update u -= lambda*(L(u)-rhs) on cells of one parity;
full-weighting restriction; piecewise-constant prolongation.
"""

import numpy as np


def laplacian_loops(u_gh, dx):
    n = tuple(s - 2 for s in u_gh.shape)
    out = np.zeros(n, dtype=u_gh.dtype)
    for i in range(n[0]):
        for j in range(n[1]):
            for k in range(n[2]):
                I, J, K = i + 1, j + 1, k + 1
                out[i, j, k] = (
                    u_gh[I + 1, J, K]
                    + u_gh[I - 1, J, K]
                    + u_gh[I, J + 1, K]
                    + u_gh[I, J - 1, K]
                    + u_gh[I, J, K + 1]
                    + u_gh[I, J, K - 1]
                    - 6.0 * u_gh[I, J, K]
                ) / (dx * dx)
    return out


def apply_op_loops(u_gh, a, b, alpha, beta, dx):
    lap = laplacian_loops(u_gh, dx)
    u = u_gh[1:-1, 1:-1, 1:-1]
    bb = 1.0 if b is None else b
    return alpha * a * u - beta * bb * lap


def gsrb_color_loops(u_gh, rhs, a, b, lam, alpha, beta, dx, lo, red_black):
    u_gh = u_gh.copy()
    n = rhs.shape
    for i in range(n[0]):
        for j in range(n[1]):
            for k in range(n[2]):
                gi = i + lo[0] + j + lo[1] + k + lo[2]
                if (gi + red_black) % 2 != 0:
                    continue
                I, J, K = i + 1, j + 1, k + 1
                bb = 1.0 if b is None else b[i, j, k]
                lap = (
                    u_gh[I + 1, J, K]
                    + u_gh[I - 1, J, K]
                    + u_gh[I, J + 1, K]
                    + u_gh[I, J - 1, K]
                    + u_gh[I, J, K + 1]
                    + u_gh[I, J, K - 1]
                    - 6.0 * u_gh[I, J, K]
                ) / (dx * dx)
                lofu = alpha * a[i, j, k] * u_gh[I, J, K] - beta * bb * lap
                u_gh[I, J, K] -= lam[i, j, k] * (lofu - rhs[i, j, k])
    return u_gh[1:-1, 1:-1, 1:-1]


def restrict_loops(f):
    n = tuple(s // 2 for s in f.shape)
    out = np.zeros(n, dtype=f.dtype)
    for i in range(n[0]):
        for j in range(n[1]):
            for k in range(n[2]):
                out[i, j, k] = f[
                    2 * i : 2 * i + 2, 2 * j : 2 * j + 2, 2 * k : 2 * k + 2
                ].mean()
    return out


def prolong_loops(e_c):
    n = tuple(2 * s for s in e_c.shape)
    out = np.zeros(n, dtype=e_c.dtype)
    for i in range(n[0]):
        for j in range(n[1]):
            for k in range(n[2]):
                out[i, j, k] = e_c[i // 2, j // 2, k // 2]
    return out
