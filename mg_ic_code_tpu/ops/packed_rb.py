"""Checkerboard-PACKED red-black storage for the GSRB smoother.

The masked-update smoother computes the full stencil everywhere and throws
half of it away each colour pass (plus full-size parity masks) — measured
VPU-bound at ~22% of HBM roofline. Packing the lattice by colour removes
all of that:

    R[i, j, t] = u[i, j, 2t + p],   B[i, j, t] = u[i, j, 2t + 1 - p],
    p = (i + j + base) & 1

Every neighbour of a red cell is black, so a red update reads ONLY B:
x/y neighbours land at the SAME packed t index (rows j+-1 / i+-1 flip
parity, which exactly cancels the k-offset change), and z neighbours are
B[t-1+p] + B[t+p] — one parity-dependent shift, implemented as a select
between the two rolls. No parity masks, no discarded arithmetic, and each
colour pass writes only its own half-array.

Ghost rules (homogeneous Dirichlet/Neumann/CF/periodic) act on the
unpacked lattice; their packed forms mix the two colour arrays at the face
(e.g. z-lo ghost of a p=0 row: -2 R[...,0] + B[...,0]/3).

This module holds the packing transforms and the jnp (XLA) packed sweep —
the correctness reference and a faster XLA path; the Pallas kernelisation
reuses exactly this math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mg_ic_code_tpu.ops.ghosts import (
    CF, PERIODIC, PHYS_DIRICHLET, PHYS_NEUMANN, FaceKinds, cf_homog_weights, ghost_plane,
)


@functools.lru_cache(maxsize=64)
def _row_parity_np(nx: int, ny: int, base: int):
    import numpy as np

    i = np.arange(nx)[:, None, None]
    j = np.arange(ny)[None, :, None]
    return ((i + j + base) & 1).astype(np.bool_)


def row_parity(nx: int, ny: int, base: int):
    """(nx, ny, 1) bool: p = (i+j+base)&1 — which half-lane holds red."""
    return jnp.asarray(_row_parity_np(nx, ny, base))


def pack(u, base: int):
    """u (nx,ny,nz) -> (R, B) each (nx,ny,nz/2)."""
    nx, ny, nz = u.shape
    v = u.reshape(nx, ny, nz // 2, 2)
    even, odd = v[..., 0], v[..., 1]
    p = row_parity(nx, ny, base)
    red = jnp.where(p, odd, even)
    black = jnp.where(p, even, odd)
    return red, black


def unpack(red, black, base: int):
    nx, ny, nt = red.shape
    p = row_parity(nx, ny, base)
    even = jnp.where(p, black, red)
    odd = jnp.where(p, red, black)
    return jnp.stack([even, odd], axis=-1).reshape(nx, ny, 2 * nt)


_ghost = ghost_plane  # the shared rule (ops/ghosts.py)


def _neighbour_sum_packed(act, oth, p_act, kinds: FaceKinds, rho: float):
    """Sum of the six unpacked neighbours of the ACTIVE colour's cells,
    read from the OTHER colour's packed array.

    act: the active colour's packed array (used only for its own value in
    ghost rules); oth: the other colour's packed array. p_act (nx,ny,1)
    bool: k-parity of the active colour per row ((k = 2t + p_act)).
    """
    nx, ny, nt = act.shape

    # ---- x neighbours: oth[i +- 1, j, t], edge rows ghosted
    xp = jnp.roll(oth, -1, 0)
    xm = jnp.roll(oth, 1, 0)
    if kinds[0][0] != PERIODIC:
        ii = jax.lax.broadcasted_iota(jnp.int32, act.shape, 0)
        # ghost at i=nx: -2*act[nx-1] + oth[nx-2]... careful: unpacked
        # u(nx-1,j,k)=act edge cell, u(nx-2,j,k)=oth (parity flips with i)
        g_hi = _ghost(kinds[0][1], act[-1:], oth[-2:-1], rho)
        xp = jnp.where(ii == nx - 1, g_hi, xp)
        g_lo = _ghost(kinds[0][0], act[:1], oth[1:2], rho)
        xm = jnp.where(ii == 0, g_lo, xm)

    # ---- y neighbours: oth[i, j +- 1, t]
    yp = jnp.roll(oth, -1, 1)
    ym = jnp.roll(oth, 1, 1)
    if kinds[1][0] != PERIODIC:
        jj = jax.lax.broadcasted_iota(jnp.int32, act.shape, 1)
        g_hi = _ghost(kinds[1][1], act[:, -1:], oth[:, -2:-1], rho)
        yp = jnp.where(jj == ny - 1, g_hi, yp)
        g_lo = _ghost(kinds[1][0], act[:, :1], oth[:, 1:2], rho)
        ym = jnp.where(jj == 0, g_lo, ym)

    # ---- z neighbours: oth[t-1+p] + oth[t+p]
    # p=0 rows (active at even k): oth[t-1] + oth[t]
    # p=1 rows (active at odd k):  oth[t]   + oth[t+1]
    zm_roll = jnp.roll(oth, 1, 2)  # oth[t-1]
    zp_roll = jnp.roll(oth, -1, 2)  # oth[t+1]
    if kinds[2][0] == PERIODIC:
        # periodic z: rolls wrap correctly ONLY if nz is even (it is): the
        # neighbour of the last active cell wraps into the first other cell
        zsum = jnp.where(p_act, oth + zp_roll, zm_roll + oth)
    else:
        kk = jax.lax.broadcasted_iota(jnp.int32, act.shape, 2)
        # p=0: at t=0 the k-1 neighbour is the z-lo ghost:
        #   unpacked u(.,.,0)=act, u(.,.,1)=oth  ->  g(act[0], oth[0])
        g_lo = _ghost(kinds[2][0], act[:, :, :1], oth[:, :, :1], rho)
        zm = jnp.where(kk == 0, g_lo, zm_roll)
        zsum_p0 = zm + oth
        # p=1: at t=nt-1 the k+1 neighbour is the z-hi ghost:
        #   u(.,.,nz-1)=act, u(.,.,nz-2)=oth -> g(act[-1], oth[-1])
        g_hi = _ghost(kinds[2][1], act[:, :, -1:], oth[:, :, -1:], rho)
        zp = jnp.where(kk == nt - 1, g_hi, zp_roll)
        zsum_p1 = oth + zp
        zsum = jnp.where(p_act, zsum_p1, zsum_p0)

    return xp + xm + yp + ym + zsum


def packed_half_sweep(
    act, oth, a_act, rhs_act, p_act, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
):
    """GSRB update of the active colour's packed array (every element is an
    active cell — no masks, no discarded work)."""
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    nb = _neighbour_sum_packed(act, oth, p_act, kinds, rho)
    lap = nb - 6.0 * act
    lam = 1.0 / (alpha * a_act + 6.0 * b_inv)
    return act - lam * (alpha * a_act * act - b_inv * lap - rhs_act)


def _xpad_oth(act, oth, kinds: FaceKinds, rho: float):
    """Prepad the OTHER colour's array with its x ghost rows (the active
    update reads oth at i±1; at the domain faces those are BC ghosts built
    from the face-active cell and the next interior other-cell)."""
    if kinds[0][0] == PERIODIC:
        return jnp.concatenate([oth[-1:], oth, oth[:1]], axis=0)
    lo = _ghost(kinds[0][0], act[:1], oth[1:2], rho)
    hi = _ghost(kinds[0][1], act[-1:], oth[-2:-1], rho)
    return jnp.concatenate([lo, oth, hi], axis=0)


def _packed_colour_kernel(
    oth_hbm, act_ref, a_ref, rhs_ref, pm_ref, o_ref, oth_vmem, sem, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    bx: int,
):
    """One colour pass in packed storage: a single fused slab kernel with
    NO parity masks and no discarded arithmetic (the packed_rb math)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    start = jax.lax.convert_element_type(i * bx, jnp.int32)
    cp = pltpu.make_async_copy(oth_hbm.at[pl.ds(start, bx + 2)], oth_vmem, sem)
    cp.start()
    cp.wait()
    slab = oth_vmem[...]  # (bx+2, ny, nt)
    oc = slab[1:-1]
    act = act_ref[...]
    av = a_ref[...]
    rv = rhs_ref[...]
    pm = pm_ref[...]  # (bx, ny, 1) active-colour k-parity as float 0/1
    ny, nt = act.shape[1], act.shape[2]

    xp = slab[2:]
    xm = slab[:-2]

    yp = jnp.roll(oc, -1, 1)
    ym = jnp.roll(oc, 1, 1)
    if kinds[1][0] != PERIODIC:
        jj = jax.lax.broadcasted_iota(jnp.int32, act.shape, 1)
        yp = jnp.where(
            jj == ny - 1,
            _ghost(kinds[1][1], act[:, -1:], oc[:, -2:-1], rho), yp,
        )
        ym = jnp.where(
            jj == 0, _ghost(kinds[1][0], act[:, :1], oc[:, 1:2], rho), ym
        )

    zm = jnp.roll(oc, 1, 2)
    zp = jnp.roll(oc, -1, 2)
    if kinds[2][0] != PERIODIC:
        kk = jax.lax.broadcasted_iota(jnp.int32, act.shape, 2)
        zm = jnp.where(
            kk == 0, _ghost(kinds[2][0], act[:, :, :1], oc[:, :, :1], rho), zm
        )
        zp = jnp.where(
            kk == nt - 1,
            _ghost(kinds[2][1], act[:, :, -1:], oc[:, :, -1:], rho), zp,
        )
    zsum = (oc + zp) * pm + (zm + oc) * (1.0 - pm)

    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    lap = xp + xm + yp + ym + zsum - 6.0 * act
    lam = 1.0 / (alpha * av + 6.0 * b_inv)
    o_ref[...] = act - lam * (alpha * av * act - b_inv * lap - rv)


def packed_colour_sweep_pallas(
    act, oth, a_act, rhs_act, p_act_f, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    bx: int = 8, interpret: bool = False,
):
    """Pallas launch of one packed colour pass. p_act_f: (nx, ny, 1) float
    0/1 parity of the active colour."""
    import functools as _ft

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mg_ic_code_tpu.ops.pallas_kernels import _i32map, pick_bx

    nx, ny, nt = act.shape
    bx = pick_bx(nx, bx)
    oth_xp = _xpad_oth(act, oth, kinds, rho)
    kern = _ft.partial(
        _packed_colour_kernel, kinds=kinds, rho=rho, alpha=alpha, beta=beta,
        dx=dx, bx=bx,
    )
    return pl.pallas_call(
        kern,
        grid=(nx // bx,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((bx, ny, nt), _i32map("i", 0, 0)),
            pl.BlockSpec((bx, ny, nt), _i32map("i", 0, 0)),
            pl.BlockSpec((bx, ny, nt), _i32map("i", 0, 0)),
            pl.BlockSpec((bx, ny, 1), _i32map("i", 0, 0)),
        ],
        out_specs=pl.BlockSpec((bx, ny, nt), _i32map("i", 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nt), act.dtype),
        scratch_shapes=[
            pltpu.VMEM((bx + 2, ny, nt), act.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(oth_xp, act, a_act, rhs_act, p_act_f)


def packed_relax_pallas(
    u, rhs, a, n: int, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int = 8, interpret: bool = False,
):
    """n full red+black sweeps with the packed Pallas kernels."""
    base = sum(lo)
    nx, ny, _ = u.shape
    p = row_parity(nx, ny, base)
    pf_r = p.astype(u.dtype)
    pf_b = (~p).astype(u.dtype)
    red, black = pack(u, base)
    a_r, a_b = pack(a, base)
    rhs_r, rhs_b = pack(rhs, base)
    kw = dict(kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx, bx=bx,
              interpret=interpret)
    for _ in range(n):
        red = packed_colour_sweep_pallas(red, black, a_r, rhs_r, pf_r, **kw)
        black = packed_colour_sweep_pallas(black, red, a_b, rhs_b, pf_b, **kw)
    return unpack(red, black, base)


def packed_relax(
    u, rhs, a, n: int, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo,
):
    """n full red+black sweeps in packed storage (XLA path). Equivalent to
    the masked relax (tests), with pack/unpack amortised over the sweeps."""
    base = sum(lo)
    nx, ny, _ = u.shape
    p = row_parity(nx, ny, base)  # red sits at k = 2t + p
    red, black = pack(u, base)
    a_r, a_b = pack(a, base)
    rhs_r, rhs_b = pack(rhs, base)
    kw = dict(kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx)
    # for the black colour the k-parity per row is the complement
    p_b = ~p

    def body(_, carry):
        r, b = carry
        r = packed_half_sweep(r, b, a_r, rhs_r, p, **kw)
        b = packed_half_sweep(b, r, a_b, rhs_b, p_b, **kw)
        return (r, b)

    red, black = jax.lax.fori_loop(0, n, body, (red, black))
    return unpack(red, black, base)
