"""Temporally-blocked and whole-level-resident GSRB Pallas kernels.

Round-1 measurement (docs/PERF.md): on the tunnelled TPU each Pallas launch
costs a FIXED ~3.3 ms of dispatch, and the fused one-sweep kernel streams
~4N+ cells/sweep — so nsmooth=4 relaxation paid 4 launches and 4 full HBM
passes. These kernels restructure the hot loop (reference:
GSRBHELMHOLTZVC3D, VariableCoeffPoissonOperatorF.ChF:56-139, executed
4 smooths x 2 colours x depths x V-cycles x Krylov iters) around the two
real costs on TPU — launch count and HBM traffic:

* `multisweep_relax` — S full red+black sweeps in ONE launch by temporal
  blocking: each x-slab is loaded with a 2S-row halo per side and the 2S
  colour passes run in VMEM, redundantly recomputing the halo rows the
  neighbouring slabs own (trapezoidal/overlapped tiling). Per S sweeps the
  HBM traffic is 3*(bx+4S)/bx + 1 cell-streams instead of ~4S+, and one
  launch replaces 2S. The slab's x ghost planes are DMA'd from a tiny
  side-pad array inside the kernel (edge blocks only) — the round-1
  full-array x-prepad concat (2N extra traffic per array) is gone.
* `resident_relax` / `resident_residual` — for levels that fit in VMEM
  (everything below ~256^3), the ENTIRE level is pinned in VMEM and all
  2S colour passes (or the residual) run in one launch with no slabbing
  and no DMA choreography at all. This covers every MG depth of the
  canonical 7-level BBH hierarchy except the finest (944x128x128), which
  takes the slab path.

Both preserve the exact update ordering of the sequential smoother: every
redundantly-computed halo cell evaluates the same arithmetic as the owning
slab, and the x-face ghost row is re-derived after every colour pass
(matching levelGSRB's per-colour BC refresh,
VariableCoeffPoissonOperator.cpp:290-330), so results are bitwise equal to
the one-sweep-at-a-time kernels.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mg_ic_code_tpu.ops.ghosts import (
    CF, PERIODIC, PHYS_DIRICHLET, PHYS_NEUMANN, FaceKinds, cf_homog_weights, ghost_plane,
)

# Mosaic's default VMEM budget is 16 MB; v5e has ~128 MB usable
VMEM_LIMIT = 100 * 1024 * 1024
# the auto-pipelined family gets the full chip: width=2 at s=4/256^3 is
# 112 MB by the working-set model and Mosaic accepts it at this budget
# (measured, scripts/_probe_width.py); width=4 at s=4 does not compile
PIPE_VMEM_LIMIT = 120 * 1024 * 1024

# working-set multiplier: live slabs (u/rhs/a) + pass temporaries (lap,
# rolls, update) that Mosaic holds simultaneously. Calibrated on v5e:
# S=4/bx=16 at 256^3 (32-row slabs) exceeds the compiler's budget while
# S=4/bx=8 (24-row) and S=3/bx=16 (28-row) fit.
_SLAB_WS_ROWS = 14.0
# resident kernels: measured Mosaic stack demand for 4 sweeps at 128^3 is
# 111 MB = 13.9 array-equivalents (the XLA error names the scoped
# allocation), so 128^3 takes the slab path and resident covers <= ~96^3
_RESIDENT_WS_ARRAYS = 14.0
_RESIDENT_CAP = VMEM_LIMIT


def _i32(v):
    return jax.lax.convert_element_type(v, jnp.int32)


_ghost = ghost_plane  # the shared rule (ops/ghosts.py)


def _axis_neighbour_sum(uc, axis: int, kinds: FaceKinds, rho: float):
    """vp + vm along one axis with the homogeneous ghost rule replacing the
    wrapped edge planes (masked selects — plane-indexed ref stores do not
    lower under Mosaic)."""
    n_ax = uc.shape[axis]
    vp = jnp.roll(uc, -1, axis)
    vm = jnp.roll(uc, 1, axis)
    if kinds[axis][0] != PERIODIC:
        idx = jax.lax.broadcasted_iota(jnp.int32, uc.shape, axis)

        def pick(a, b):
            sl = [slice(None)] * uc.ndim
            sl[axis] = slice(a, b)
            return uc[tuple(sl)]

        ghost_hi = _ghost(kinds[axis][1], pick(n_ax - 1, n_ax),
                          pick(n_ax - 2, n_ax - 1), rho)
        vp = jnp.where(idx == n_ax - 1, ghost_hi, vp)
        ghost_lo = _ghost(kinds[axis][0], pick(0, 1), pick(1, 2), rho)
        vm = jnp.where(idx == 0, ghost_lo, vm)
    return vp + vm


def _yz_neighbour_sum(uc, kinds: FaceKinds, rho: float):
    return (_axis_neighbour_sum(uc, 1, kinds, rho)
            + _axis_neighbour_sum(uc, 2, kinds, rho))


def _parity(shape, dtype, i0_offset, base, j0_offset=0):
    """(i+j+k+base)&1 as a float mask, with axis-0/axis-1 indices offset
    by i0_offset/j0_offset (traced or static)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (
        (ii + _i32(i0_offset) + jj + _i32(j0_offset) + kk + base) & 1
    ).astype(dtype)


# --------------------------------------------------------------------------
# slab multisweep kernel
# --------------------------------------------------------------------------


def _load_slabs(i, triples, sems, *, bx: int, H: int, nblk: int, nx: int):
    """DMA (hbm, pad, vmem) triples so each vmem holds rows [0, R) =
    logical x rows [i*bx-H, i*bx+bx+H). Edge blocks take out-of-domain
    rows from the 2H-row pads (ghost replicas, or the wrapped rows for
    periodic x). Requires bx >= H so only edge blocks touch the pads."""
    R = bx + 2 * H

    def run(copies):
        cps = [pltpu.make_async_copy(src, dst, sems.at[jnp.int32(k)])
               for k, (src, dst) in enumerate(copies)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    if nblk == 1:
        run([c for hbm, pad, vmem in triples for c in (
            (pad.at[pl.ds(0, H)], vmem.at[pl.ds(0, H)]),
            (hbm, vmem.at[pl.ds(H, nx)]),
            (pad.at[pl.ds(H, H)], vmem.at[pl.ds(H + nx, H)]),
        )])
        return

    @pl.when(i == 0)
    def _():
        run([c for hbm, pad, vmem in triples for c in (
            (pad.at[pl.ds(0, H)], vmem.at[pl.ds(0, H)]),
            (hbm.at[pl.ds(0, bx + H)], vmem.at[pl.ds(H, bx + H)]),
        )])

    @pl.when(i == nblk - 1)
    def _():
        run([c for hbm, pad, vmem in triples for c in (
            (hbm.at[pl.ds(nx - bx - H, bx + H)], vmem.at[pl.ds(0, bx + H)]),
            (pad.at[pl.ds(H, H)], vmem.at[pl.ds(bx + H, H)]),
        )])

    if nblk > 2:  # interior blocks exist (slice sizes must stay static)
        @pl.when((i > 0) & (i < nblk - 1))
        def _():
            # the start is provably divisible by gcd(bx, H); assert it so
            # Mosaic accepts sublane-dim slicing in the flat (nx, m)
            # layout, where dim 0 carries the (8, 128) tiling and an
            # unproven-aligned dynamic offset is a compile error
            s0 = pl.multiple_of(_i32(i * bx - H), math.gcd(bx, H))
            run([(hbm.at[pl.ds(s0, R)], vmem)
                 for hbm, pad, vmem in triples])


def _ghost_lin(kind: str, rho: float) -> tuple[float, float]:
    """(c0, c1) with ghost = c0*u0 + c1*u1 — the homogeneous ghost rules
    of _ghost are all linear in the two interior planes."""
    if kind == PHYS_DIRICHLET:
        return -2.0, 1.0 / 3.0
    if kind == PHYS_NEUMANN:
        return 1.0, 0.0
    if kind == CF:
        return cf_homog_weights(rho)
    raise AssertionError(kind)


def _fold_coefs(shape_int, dt, rv, av, *, kinds: FaceKinds, rho: float,
                alpha: float, beta: float, dx: float, approx_lambda: bool,
                axes=(1, 2), axis_info=None, bv=None):
    """Per-launch folded update coefficients (measured 2.1x on v5e vs
    per-pass masked selects — the y/z edge handling was >half the pass
    cost). Because every homogeneous ghost rule is LINEAR (c0*u0 + c1*u1),
    the GSRB update collapses to

        upd = P*(x+ + x-) + PA1*vp1 + PB1*vm1 + PA2*vp2 + PB2*vm2
              + K*uc + T

    with P = lam*beta/dx^2, PA/PB carrying the edge-folded neighbour
    weights (0 outside the domain, 1+c1 at the face, 1 inside), K the uc
    coefficient including the c0 ghost feed-through, and T = lam*rhs. All
    seven fields are built ONCE per launch; each colour pass is then 4
    rolls + 2 row shifts + pure multiply-adds. Periodic axes keep PA/PB
    None (wrapped rolls are exact) and pay P instead.

    `axis_info[axis] = (offset, n_global)` places a BLOCK of a blocked
    axis in the global frame (the tiled kernel): the domain-face fold
    then fires only where the block actually touches the domain; offset
    may be traced."""
    b_inv = beta * (1.0 / (dx * dx))
    # lambda keeps the reference's bCoef~1 diagonal approximation
    # (resetLambda, VariableCoeffPoissonOperator.cpp:220-249, TODO note)
    diag = alpha * av + 6.0 * b_inv
    lam = pl.reciprocal(diag, approx=True) if approx_lambda else 1.0 / diag
    # variable bCoef multiplies the whole Laplacian at the update point
    # (GSRBHELMHOLTZVC3D: ldpsi * bCoef(i,j,k) — cell-centred, not flux
    # form), so it folds into P as a field
    P = lam * b_inv if bv is None else lam * b_inv * bv
    pab = {}
    c_sum = None
    axis_info = axis_info or {}
    for axis in axes:
        if kinds[axis][0] == PERIODIC:
            pab[axis] = (None, None)
            continue
        off, n_ax = axis_info.get(axis, (0, shape_int[axis]))
        c0l, c1l = _ghost_lin(kinds[axis][0], rho)
        c0h, c1h = _ghost_lin(kinds[axis][1], rho)
        idx = jax.lax.broadcasted_iota(jnp.int32, shape_int, axis) + _i32(off)
        is_lo = idx == 0
        is_hi = idx == n_ax - 1
        one = jnp.ones((), dt)
        zero = jnp.zeros((), dt)  # strong-typed: weak python 0.0 would
        # enter the kernel as an f64 scalar under jax_enable_x64
        a_vp = jnp.where(is_hi, zero, jnp.where(is_lo, one + c1l, one))
        b_vm = jnp.where(is_lo, zero, jnp.where(is_hi, one + c1h, one))
        c_ax = (jnp.where(is_lo, jnp.full((), c0l, dt), zero)
                + jnp.where(is_hi, jnp.full((), c0h, dt), zero))
        pab[axis] = (P * a_vp, P * b_vm)
        c_sum = c_ax if c_sum is None else c_sum + c_ax
    k_uc = (1.0 - lam * (alpha * av)) + P * (
        (c_sum - 6.0) if c_sum is not None else -6.0
    )
    return P, pab, k_uc, lam * rv


def _slab_passes(
    s, rv, av, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nsweeps: int, approx_lambda: bool,
    first, last, i0_off, y_info=None, compute_dtype=None,
):
    """The 2*nsweeps colour passes on one (R, ny, nz) slab `s`; rows 1..R-1
    are updatable (rv/av cover them). `first`/`last` flag true domain-edge
    blocks needing the per-pass x ghost refresh; `i0_off` is the logical x
    index of updatable row 0 (global parity). Returns the swept slab
    (in `compute_dtype` when set — the caller casts back on store).

    Uses the folded-coefficient update (_fold_coefs): all loop-invariant
    fields (ghost-rule folding, lambda, parity masks) are built once, so a
    pass is 4 rolls + multiply-adds — 2.1x faster than the round-1 form
    whose y/z edge selects recomputed iotas/ghost planes every pass.

    `compute_dtype` (e.g. bfloat16) runs the colour passes in reduced
    precision — the smoother-grade tier of the mixed-precision design
    (docs/ARCHITECTURE.md section 5): the preconditioner's V-cycle
    residuals/restriction stay f32, only the sweep arithmetic drops. The
    per-launch folding (lambda reciprocal, rhs scaling) always computes in
    at least f32 and is cast once, so reduced precision perturbs each
    sweep by O(eps_bf16) without biasing the fixed point (the folded
    update still has u = exact-GSRB(u) at convergence up to rounding)."""
    R = s.shape[0]
    cdt = s.dtype if compute_dtype is None else jnp.dtype(compute_dtype)
    fdt = (
        jnp.float32
        if (cdt == jnp.bfloat16 or s.dtype == jnp.bfloat16)
        else s.dtype
    )
    P, pab, k_uc, t_rhs = _fold_coefs(
        (R - 2,) + s.shape[1:], fdt, rv.astype(fdt), av.astype(fdt),
        kinds=kinds, rho=rho,
        alpha=alpha, beta=beta, dx=dx, approx_lambda=approx_lambda,
        axis_info={1: y_info} if y_info is not None else None,
    )
    if cdt != fdt:
        cast = lambda x: None if x is None else x.astype(cdt)  # noqa: E731
        P, k_uc, t_rhs = cast(P), cast(k_uc), cast(t_rhs)
        pab = {ax: (cast(a), cast(b)) for ax, (a, b) in pab.items()}
    s = s.astype(cdt)
    par0 = _parity(
        ((R - 2,) + s.shape[1:]), cdt, i0_off, base,
        j0_offset=y_info[0] if y_info is not None else 0,
    )
    pars = (par0, (1.0 - par0).astype(cdt))
    row = jax.lax.broadcasted_iota(jnp.int32, (R - 2, 1, 1), 0)

    for p in range(2 * nsweeps):
        uc = s[1:-1]
        acc = P * (s[2:] + s[:-2]) + k_uc * uc + t_rhs
        for axis in (1, 2):
            pa, pb = pab[axis]
            vp = jnp.roll(uc, -1, axis)
            vm = jnp.roll(uc, 1, axis)
            acc = (acc + P * (vp + vm) if pa is None
                   else acc + pa * vp + pb * vm)
        new_int = acc + pars[p & 1] * (uc - acc)
        if kinds[0][0] != PERIODIC:
            # re-derive the x-face ghost row from the post-pass interior
            # (levelGSRB re-applies BCs between colours)
            H_ = 2 * nsweeps
            lo_g = _ghost(kinds[0][0], new_int[H_ - 1:H_],
                          new_int[H_:H_ + 1], rho)
            hi_g = _ghost(kinds[0][1], new_int[bx + H_ - 2:bx + H_ - 1],
                          new_int[bx + H_ - 3:bx + H_ - 2], rho)
            new_int = jnp.where(first & (row == H_ - 2), lo_g, new_int)
            new_int = jnp.where(last & (row == bx + H_ - 1), hi_g, new_int)
        s = jnp.concatenate([s[:1], new_int, s[-1:]], axis=0)
    return s


def _multisweep_kernel(
    edges_ref, u_hbm, upad_hbm, rhs_hbm, rpad_hbm, a_hbm, apad_hbm, o_ref,
    u_vmem, rhs_vmem, a_vmem, sems, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nblk: int, nx: int, nsweeps: int,
    approx_lambda: bool, compute_dtype=None,
):
    H = 2 * nsweeps
    i = pl.program_id(0)
    _load_slabs(
        i,
        [(u_hbm, upad_hbm, u_vmem), (rhs_hbm, rpad_hbm, rhs_vmem),
         (a_hbm, apad_hbm, a_vmem)],
        sems, bx=bx, H=H, nblk=nblk, nx=nx,
    )

    s = u_vmem[...]             # (R, ny, nz): logical rows i*bx-H ..
    rv = rhs_vmem[1:-1]         # rows 1..R-1 (the updatable interior)
    av = a_vmem[1:-1]

    # meta (SMEM, int32 (4,)): [lo_edge, hi_edge, x_off, y_off(unused here —
    # an x-slab is never y-sharded; shared layout with the tiled kernels so
    # halo.sharded_relax builds ONE meta)]. lo/hi_edge say
    # whether this array's x faces are true domain faces needing the
    # per-pass ghost refresh — 0 when the face is a shard seam whose halo
    # pad carries real neighbour data (parallel/halo.py); x_off is the
    # shard's global x origin, keeping the GSRB checkerboard global.
    first = (i == 0) & (edges_ref[0] != 0)
    last = (i == nblk - 1) & (edges_ref[1] != 0)
    # logical x of updatable row q is q + 1 + i*bx - H (+ shard origin)
    i0_off = i * bx - H + 1 + edges_ref[2]

    s = _slab_passes(
        s, rv, av, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, bx=bx, nsweeps=nsweeps, approx_lambda=approx_lambda,
        first=first, last=last, i0_off=i0_off, compute_dtype=compute_dtype,
    )
    o_ref[...] = s[H:-H].astype(o_ref.dtype)


def _x_pads(u, rhs, a, H: int, kinds: FaceKinds, rho: float):
    """(2H, ny, nz) side-pad arrays: rows [0,H) belong logically below the
    domain, rows [H,2H) above. Periodic: the wrapped rows. Non-periodic:
    the u pad replicates the one-ring ghost (deeper rows only feed
    redundant updates that the per-pass ghost refresh overwrites);
    rhs/a pads are zero (aCoef=0 keeps lambda finite)."""
    if kinds[0][0] == PERIODIC:
        return (
            jnp.concatenate([u[-H:], u[:H]], axis=0),
            jnp.concatenate([rhs[-H:], rhs[:H]], axis=0),
            jnp.concatenate([a[-H:], a[:H]], axis=0),
        )
    lo = _ghost(kinds[0][0], u[:1], u[1:2], rho)
    hi = _ghost(kinds[0][1], u[-1:], u[-2:-1], rho)
    upad = jnp.concatenate(
        [jnp.broadcast_to(lo, (H,) + u.shape[1:]),
         jnp.broadcast_to(hi, (H,) + u.shape[1:])], axis=0)
    zpad = jnp.zeros((2 * H,) + u.shape[1:], u.dtype)
    return upad, zpad, zpad


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "bx", "interpret", "approx_lambda", "compute_dtype"),
)
def multisweep_relax(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, interpret: bool = False, approx_lambda: bool = False,
    halo=None, compute_dtype=None,
):
    """nsweeps full red+black GSRB sweeps in a single kernel launch.

    Requires slab_supported(shape, bx, nsweeps). Bitwise-equivalent to
    nsweeps sequential pallas_kernels.gsrb_full_sweep calls
    (tests/test_fused_sweeps.py).

    `halo` (optional, traced) makes the kernel shard-aware for use inside
    shard_map on an x-slab of a larger level (parallel/halo.py): a tuple
    `(upad, rpad, apad, meta)` where the `(2H, ny, nz)` pads carry the
    NEIGHBOUR shards' u/rhs/aCoef rows (exchanged via ppermute) instead of
    ghost replicas, and `meta` is int32 `(4,)` = [lo_is_domain_edge,
    hi_is_domain_edge, global_x_offset]. Temporal blocking then recomputes
    the seam rows exactly as the owning shard does, so the sharded result
    is bitwise-equal to the unsharded kernel."""
    nx, ny, nz = u.shape
    H = 2 * nsweeps
    assert nx % bx == 0 and bx >= H, (nx, bx, H)
    nblk = nx // bx
    if halo is None:
        upad, rpad, apad = _x_pads(u, rhs, a, H, kinds, rho)
        meta = jnp.array([1, 1, 0, 0], jnp.int32)
    else:
        upad, rpad, apad, meta = halo
        assert upad.shape == (2 * H, ny, nz), (upad.shape, H)
    kern = functools.partial(
        _multisweep_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, nx=nx, nsweeps=nsweeps,
        approx_lambda=approx_lambda, compute_dtype=compute_dtype,
    )
    R = bx + 2 * H
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((4,), lambda i: (jnp.int32(0),),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec(
            (bx, ny, nz), lambda i: (i, jnp.int32(0), jnp.int32(0))
        ),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, ny, nz), u.dtype),
            pltpu.VMEM((R, ny, nz), u.dtype),
            pltpu.VMEM((R, ny, nz), u.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(meta, u, upad, rhs, rpad, a, apad)


# --------------------------------------------------------------------------
# pipelined slab multisweep: halo = whole neighbour blocks, auto-pipelined
# --------------------------------------------------------------------------


def _pipelined_kernel(
    ulo, umid, uhi, rlo, rmid, rhi, alo, amid, ahi, o_ref, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nblk: int, nsweeps: int, approx_lambda: bool,
    compute_dtype=None,
):
    H = 2 * nsweeps  # lo/hi halo-block rows; the mid block is width*H rows
    i = pl.program_id(0)
    s = jnp.concatenate([ulo[...], umid[...], uhi[...]], axis=0)
    rv = jnp.concatenate([rlo[...], rmid[...], rhi[...]], axis=0)
    av = jnp.concatenate([alo[...], amid[...], ahi[...]], axis=0)
    first = i == 0
    last = i == nblk - 1
    if kinds[0][0] != PERIODIC:
        # the clamped neighbour blocks at the domain edges carry duplicate
        # rows: overwrite them with the one-ring ghost replica (u) / zeros
        # (rhs, aCoef with lambda kept finite), matching _x_pads
        row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1, 1), 0)
        g_lo = _ghost(kinds[0][0], s[H:H + 1], s[H + 1:H + 2], rho)
        g_hi = _ghost(kinds[0][1], s[H + bx - 1:H + bx],
                      s[H + bx - 2:H + bx - 1], rho)
        in_lo = first & (row < H)
        in_hi = last & (row >= H + bx)
        s = jnp.where(in_lo, g_lo, jnp.where(in_hi, g_hi, s))
        zero = jnp.zeros((), s.dtype)
        dead = in_lo | in_hi
        rv = jnp.where(dead, zero, rv)
        av = jnp.where(dead, zero, av)
    s = _slab_passes(
        s, rv[1:-1], av[1:-1],
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, bx=bx, nsweeps=nsweeps, approx_lambda=approx_lambda,
        first=first, last=last, i0_off=i * bx - H + 1,
        compute_dtype=compute_dtype,
    )
    o_ref[...] = s[H:-H].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "interpret", "approx_lambda", "compute_dtype", "width"),
)
def multisweep_relax_pipelined(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, interpret: bool = False, approx_lambda: bool = False,
    compute_dtype=None, width: int = 1,
):
    """multisweep_relax with the slab DMA handed to the standard Pallas
    pipeline: the mid block is bx = width * 2*nsweeps rows and the halo
    blocks are the adjacent 2*nsweeps rows on either side, expressible as
    three blocked in_specs per array whose index maps wrap (periodic) or
    clamp (physical/CF; the duplicate rows are overwritten with ghost
    replicas in-kernel). Mosaic then double-buffers all 9 input streams
    against the colour-pass compute — the manual serial DMA+wait of
    multisweep_relax is off the critical path.

    `width` trades VMEM for redundancy: the halo recompute and read
    amplification are both (width+2)/width x the minimum (3x at width=1,
    2x at width=2, 1.5x at width=4) while the live window grows to
    (width+2)*2*nsweeps rows. Bitwise-equal to multisweep_relax at the
    same (nsweeps, bx) for every width."""
    nx, ny, nz = u.shape
    H = 2 * nsweeps
    bx = width * H
    assert nx % bx == 0 and nx // bx >= 1, (nx, bx)
    nblk = nx // bx
    nblk_h = nx // H  # the halo blocks live on the finer H-row grid
    periodic = kinds[0][0] == PERIODIC
    if periodic:
        lo_map = lambda i: ((i * width - 1) % nblk_h, jnp.int32(0),
                            jnp.int32(0))
        hi_map = lambda i: ((i * width + width) % nblk_h, jnp.int32(0),
                            jnp.int32(0))
    else:
        lo_map = lambda i: (jnp.maximum(i * width - 1, 0), jnp.int32(0),
                            jnp.int32(0))
        hi_map = lambda i: (jnp.minimum(i * width + width, nblk_h - 1),
                            jnp.int32(0), jnp.int32(0))
    mid_map = lambda i: (i, jnp.int32(0), jnp.int32(0))
    blk = (bx, ny, nz)
    hblk = (H, ny, nz)
    triple = [pl.BlockSpec(hblk, lo_map), pl.BlockSpec(blk, mid_map),
              pl.BlockSpec(hblk, hi_map)]
    kern = functools.partial(
        _pipelined_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, nsweeps=nsweeps,
        approx_lambda=approx_lambda, compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=triple * 3,
        out_specs=pl.BlockSpec(blk, mid_map),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=PIPE_VMEM_LIMIT
        ),
        interpret=interpret,
    )(u, u, u, rhs, rhs, rhs, a, a, a)


def pipelined_supported(shape, nsweeps: int, width: int = 1) -> bool:
    """The mid block is width * the halo depth 2*nsweeps, so nx must tile
    by it and the (width+2)-block live window must fit VMEM."""
    nx, ny, nz = shape
    H = 2 * nsweeps
    bx = width * H
    if ny % 8 or nz % 128 or nx % bx or nx // bx < 1:
        return False
    ws = _SLAB_WS_ROWS * ((width + 2) * H) * ny * nz * 4
    # the raised 120 MB budget is only probed for width >= 2 (ADVICE r4):
    # width-1 shapes keep the original limit so an un-probed 100-120 MB
    # width-1 working set falls back gracefully instead of risking a
    # Mosaic compile failure
    return ws <= (VMEM_LIMIT if width == 1 else PIPE_VMEM_LIMIT)


# --------------------------------------------------------------------------
# flat-lane slab multisweep: (nx, ny*nz) layout for nz % 128 != 0 shapes
# --------------------------------------------------------------------------


def _fold_coefs_flat(dt, rv, av, kidx, yidx, *, ny: int, nz: int,
                     kinds: FaceKinds, rho: float, alpha: float, beta: float,
                     dx: float, approx_lambda: bool):
    """_fold_coefs for the flattened (rows, ny*nz) layout: the y/z ghost
    rules are linear in (uc, inner-neighbour), so they fold into per-lane
    weight planes indexed by kidx/yidx —

        acc = PA_z*vp_z + PB_z*vm_z + PA_y*vp_y + PB_y*vm_y + K*uc + T

    with vp/vm the plain lane shifts (±1 for z, ±nz for y). At an edge
    lane the shifted value is a cross-row artifact; its weight is zero
    there and the ghost rule's (c0, c1) fold into K and the OPPOSITE
    shift's weight instead (ghost_hi = c0*uc + c1*vm). PERIODIC axes
    return None weights — wrap is data movement, not a weight, and stays a
    per-pass select. Measured 2.1x on the pass cost in the 3-D layout
    (docs/PERF.md folded-coefficient colour pass)."""
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    diag = alpha * av + 6.0 * b_inv
    lam = pl.reciprocal(diag, approx=True) if approx_lambda else 1.0 / diag
    P = lam * b_inv
    one = jnp.ones((), dt)
    zero = jnp.zeros((), dt)
    weights = {}
    c_sum = None
    for axis, idx, n_ax in ((2, kidx, nz), (1, yidx, ny)):
        if kinds[axis][0] == PERIODIC:
            weights[axis] = (None, None)
            continue
        c0l, c1l = _ghost_lin(kinds[axis][0], rho)
        c0h, c1h = _ghost_lin(kinds[axis][1], rho)
        is_lo = idx == 0
        is_hi = idx == n_ax - 1
        a_vp = jnp.where(is_hi, zero, jnp.where(is_lo, one + c1l, one))
        b_vm = jnp.where(is_lo, zero, jnp.where(is_hi, one + c1h, one))
        c_ax = (jnp.where(is_lo, jnp.full((), c0l, dt), zero)
                + jnp.where(is_hi, jnp.full((), c0h, dt), zero))
        weights[axis] = (P * a_vp, P * b_vm)
        c_sum = c_ax if c_sum is None else c_sum + c_ax
    k_uc = (1.0 - lam * (alpha * av)) + P * (
        (c_sum - 6.0) if c_sum is not None else -6.0
    )
    return P, weights, k_uc, lam * rv


def _flat_passes(
    s, rv, av, kidx, yidx, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, ny: int, nz: int, nsweeps: int, approx_lambda: bool,
    first, last, i0_off, compute_dtype=None,
):
    """The 2*nsweeps colour passes on one (R, ny*nz) flat slab (rows 1..R-1
    updatable) in folded-coefficient form; periodic y/z axes keep per-pass
    wrapped-shift selects (wrap is data movement, not a foldable weight).
    The x-face ghost row re-derives per pass on domain-edge blocks, as in
    the 3-D layout (_slab_passes)."""
    cdt = s.dtype if compute_dtype is None else jnp.dtype(compute_dtype)
    fdt = (
        jnp.float32
        if (cdt == jnp.bfloat16 or s.dtype == jnp.bfloat16)
        else s.dtype
    )
    P, weights, k_uc, t_rhs = _fold_coefs_flat(
        fdt, rv.astype(fdt), av.astype(fdt), kidx, yidx, ny=ny, nz=nz,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        approx_lambda=approx_lambda,
    )
    if cdt != fdt:
        cast = lambda x: None if x is None else x.astype(cdt)  # noqa: E731
        P, k_uc, t_rhs = cast(P), cast(k_uc), cast(t_rhs)
        weights = {ax: (cast(a), cast(b)) for ax, (a, b) in weights.items()}
    s = s.astype(cdt)

    ii = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0] - 2,) + s.shape[1:],
                                  0)
    par0 = ((ii + _i32(i0_off) + yidx + kidx + base) & 1).astype(cdt)
    pars = (par0, (1.0 - par0).astype(cdt))
    row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0] - 2, 1), 0)
    H_ = 2 * nsweeps

    def shift(x, k):  # result[f] = x[f + k]
        return jnp.roll(x, -k, axis=1)

    for p in range(2 * nsweeps):
        uc = s[1:-1]
        acc = P * (s[2:] + s[:-2]) + k_uc * uc + t_rhs
        for axis, idx, n_ax, step in ((2, kidx, nz, 1), (1, yidx, ny, nz)):
            pa, pb = weights[axis]
            vp = shift(uc, step)
            vm = shift(uc, -step)
            if pa is None:  # periodic: wrap selects, full P weight
                vp = jnp.where(idx == n_ax - 1,
                               shift(uc, step - n_ax * step), vp)
                vm = jnp.where(idx == 0, shift(uc, n_ax * step - step), vm)
                acc = acc + P * (vp + vm)
            else:
                acc = acc + pa * vp + pb * vm
        new_int = acc + pars[p & 1] * (uc - acc)
        if kinds[0][0] != PERIODIC:
            lo_g = _ghost(kinds[0][0], new_int[H_ - 1:H_],
                          new_int[H_:H_ + 1], rho)
            hi_g = _ghost(kinds[0][1], new_int[bx + H_ - 2:bx + H_ - 1],
                          new_int[bx + H_ - 3:bx + H_ - 2], rho)
            new_int = jnp.where(first & (row == H_ - 2), lo_g, new_int)
            new_int = jnp.where(last & (row == bx + H_ - 1), hi_g, new_int)
        s = jnp.concatenate([s[:1], new_int, s[-1:]], axis=0)
    return s


def _multisweep_flat_kernel(
    u_hbm, upad_hbm, rhs_hbm, rpad_hbm, a_hbm, apad_hbm, kidx_ref, yidx_ref,
    o_ref, u_vmem, rhs_vmem, a_vmem, sems, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nblk: int, nx: int, ny: int, nz: int, nsweeps: int,
    approx_lambda: bool, compute_dtype=None,
):
    H = 2 * nsweeps
    i = pl.program_id(0)
    _load_slabs(
        i,
        [(u_hbm, upad_hbm, u_vmem), (rhs_hbm, rpad_hbm, rhs_vmem),
         (a_hbm, apad_hbm, a_vmem)],
        sems, bx=bx, H=H, nblk=nblk, nx=nx,
    )

    s = u_vmem[...]             # (R, m): logical rows i*bx-H ..
    rv = rhs_vmem[1:-1]
    av = a_vmem[1:-1]
    kidx = kidx_ref[...]        # (1, m) int32: k = f % nz
    yidx = yidx_ref[...]        # (1, m) int32: y = f // nz
    s = _flat_passes(
        s, rv, av, kidx, yidx,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, bx=bx, ny=ny, nz=nz, nsweeps=nsweeps,
        approx_lambda=approx_lambda,
        first=i == 0, last=i == nblk - 1, i0_off=i * bx - H + 1,
        compute_dtype=compute_dtype,
    )
    o_ref[...] = s[H:-H].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "bx", "interpret", "approx_lambda", "compute_dtype"),
)
def multisweep_relax_flat(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, interpret: bool = False, approx_lambda: bool = False,
    compute_dtype=None,
):
    """multisweep_relax for levels whose nz breaks the 128-lane DMA rule:
    arrays run through the kernel as (nx, ny*nz) with lane-shift
    neighbours, so any level with (ny*nz) % 128 == 0 gets kernel smoothing
    (e.g. the canonical 472x64x64 level). The entry/exit reshapes relayout
    once per chunk — amortised over the fused sweeps."""
    nx, ny, nz = u.shape
    m = ny * nz
    H = 2 * nsweeps
    # H % 8: in the flat layout dim 0 is the SUBLANE dim, so slab starts
    # i*bx - H must stay 8-aligned (flat_supported enforces this; assert
    # it at the API boundary too)
    assert (nx % bx == 0 and bx >= H and bx % 8 == 0 and H % 8 == 0
            and m % 128 == 0), (u.shape, bx, H)
    nblk = nx // bx
    uf, rf, af = (x.reshape(nx, m) for x in (u, rhs, a))
    upad, rpad, apad = _x_pads(uf, rf, af, H, kinds, rho)
    f = jnp.arange(m, dtype=jnp.int32)
    kidx = (f % nz)[None]
    yidx = (f // nz)[None]
    kern = functools.partial(
        _multisweep_flat_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, nx=nx, ny=ny, nz=nz, nsweeps=nsweeps,
        approx_lambda=approx_lambda, compute_dtype=compute_dtype,
    )
    R = bx + 2 * H
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6 + [
            pl.BlockSpec((1, m), lambda i: (jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((1, m), lambda i: (jnp.int32(0), jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec(
            (bx, m), lambda i: (i, jnp.int32(0))
        ),
        out_shape=jax.ShapeDtypeStruct((nx, m), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, m), u.dtype),
            pltpu.VMEM((R, m), u.dtype),
            pltpu.VMEM((R, m), u.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(uf, upad, rf, rpad, af, apad, kidx, yidx)
    return out.reshape(nx, ny, nz)


def _pipelined_flat_kernel(
    kidx_ref, yidx_ref, ulo, umid, uhi, rlo, rmid, rhi, alo, amid, ahi,
    o_ref, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nblk: int, ny: int, nz: int, nsweeps: int,
    approx_lambda: bool, compute_dtype=None,
):
    H = 2 * nsweeps  # lo/hi halo-block rows; the mid block is width*H rows
    i = pl.program_id(0)
    s = jnp.concatenate([ulo[...], umid[...], uhi[...]], axis=0)
    rv = jnp.concatenate([rlo[...], rmid[...], rhi[...]], axis=0)
    av = jnp.concatenate([alo[...], amid[...], ahi[...]], axis=0)
    first = i == 0
    last = i == nblk - 1
    if kinds[0][0] != PERIODIC:
        # clamped neighbour blocks at the domain edges carry duplicate
        # rows: overwrite with the one-ring ghost replica / zeros, exactly
        # as the 3-D pipelined kernel (_pipelined_kernel)
        row = jax.lax.broadcasted_iota(jnp.int32, (s.shape[0], 1), 0)
        g_lo = _ghost(kinds[0][0], s[H:H + 1], s[H + 1:H + 2], rho)
        g_hi = _ghost(kinds[0][1], s[H + bx - 1:H + bx],
                      s[H + bx - 2:H + bx - 1], rho)
        in_lo = first & (row < H)
        in_hi = last & (row >= H + bx)
        s = jnp.where(in_lo, g_lo, jnp.where(in_hi, g_hi, s))
        zero = jnp.zeros((), s.dtype)
        dead = in_lo | in_hi
        rv = jnp.where(dead, zero, rv)
        av = jnp.where(dead, zero, av)
    s = _flat_passes(
        s, rv[1:-1], av[1:-1], kidx_ref[...], yidx_ref[...],
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, bx=bx, ny=ny, nz=nz, nsweeps=nsweeps,
        approx_lambda=approx_lambda,
        first=first, last=last, i0_off=i * bx - H + 1,
        compute_dtype=compute_dtype,
    )
    o_ref[...] = s[H:-H].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "interpret", "approx_lambda", "compute_dtype", "width"),
)
def multisweep_relax_flat_pipelined(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, interpret: bool = False, approx_lambda: bool = False,
    compute_dtype=None, width: int = 1,
):
    """multisweep_relax_pipelined in the flattened (nx, ny*nz) layout for
    nz%128 != 0 levels (e.g. the canonical bbox finest 960x144x144 — 73%
    of all refined cells): the mid block is width * 2*nsweeps rows with
    2*nsweeps-row halo blocks either side, expressed as lo/mid/hi blocked
    in_specs whose index maps wrap (periodic x) or clamp (in-kernel
    ghost-replica overwrite), so Mosaic's standard pipeline double-buffers
    all 9 streams against the folded colour passes — replacing the manual
    serial DMA of multisweep_relax_flat (measured 88% vs 70% marginal
    roofline for the 3-D twins, docs/PERF.md). `width` trades VMEM for
    redundancy exactly as in multisweep_relax_pipelined. Requires
    flat_pipelined_supported."""
    nx, ny, nz = u.shape
    m = ny * nz
    H = 2 * nsweeps
    bx = width * H
    # dim 0 is the SUBLANE dim of the 2-D layout: block extents must be
    # 8-aligned, so only nsweeps in multiples of 4 qualify
    assert nx % bx == 0 and H % 8 == 0 and m % 128 == 0, (u.shape, bx)
    nblk = nx // bx
    nblk_h = nx // H
    uf, rf, af = (x.reshape(nx, m) for x in (u, rhs, a))
    f = jnp.arange(m, dtype=jnp.int32)
    kidx = (f % nz)[None]
    yidx = (f // nz)[None]
    periodic = kinds[0][0] == PERIODIC
    if periodic:
        lo_map = lambda i: ((i * width - 1) % nblk_h, jnp.int32(0))
        hi_map = lambda i: ((i * width + width) % nblk_h, jnp.int32(0))
    else:
        lo_map = lambda i: (jnp.maximum(i * width - 1, 0), jnp.int32(0))
        hi_map = lambda i: (jnp.minimum(i * width + width, nblk_h - 1),
                            jnp.int32(0))
    mid_map = lambda i: (i, jnp.int32(0))
    blk = (bx, m)
    hblk = (H, m)
    triple = [pl.BlockSpec(hblk, lo_map), pl.BlockSpec(blk, mid_map),
              pl.BlockSpec(hblk, hi_map)]
    idx_spec = pl.BlockSpec((1, m), lambda i: (jnp.int32(0), jnp.int32(0)))
    kern = functools.partial(
        _pipelined_flat_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, ny=ny, nz=nz, nsweeps=nsweeps,
        approx_lambda=approx_lambda, compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[idx_spec, idx_spec] + triple * 3,
        out_specs=pl.BlockSpec(blk, mid_map),
        out_shape=jax.ShapeDtypeStruct((nx, m), u.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=PIPE_VMEM_LIMIT
        ),
        interpret=interpret,
    )(kidx, yidx, uf, uf, uf, rf, rf, rf, af, af, af)
    return out.reshape(nx, ny, nz)


def flat_pipelined_supported(shape, nsweeps: int, width: int = 1) -> bool:
    """Shapes the pipelined flat kernel accepts: flattened lanes tiling to
    128, the halo depth 2*nsweeps 8-aligned (the flat layout's dim 0 is
    the sublane dim), the mid block width*2*nsweeps dividing nx, and the
    (width+2)-block live window within VMEM."""
    nx, ny, nz = shape
    m = ny * nz
    H = 2 * nsweeps
    bx = width * H
    if m % 128 or nx % bx or H % 8 or nx // bx < 1:
        return False
    ws = _SLAB_WS_ROWS * ((width + 2) * H) * m * 4
    # width-1 keeps the original budget - see pipelined_supported
    return ws <= (VMEM_LIMIT if width == 1 else PIPE_VMEM_LIMIT)


def flat_supported(shape, bx: int, nsweeps: int) -> bool:
    """Shapes the flat-lane slab kernel accepts: flattened lanes must tile
    to 128, and in the 2-D layout the x-slab DMA slices the SUBLANE dim, so
    bx and the halo depth 2*nsweeps must both be 8-aligned."""
    nx, ny, nz = shape
    m = ny * nz
    H = 2 * nsweeps
    if m % 128 or nx % bx or bx % 8 or H % 8 or bx < H:
        return False
    ws = _SLAB_WS_ROWS * (bx + 2 * H) * m * 4
    return ws <= VMEM_LIMIT


# --------------------------------------------------------------------------
# whole-level resident kernels
# --------------------------------------------------------------------------


def resident_relax_values(
    s, rv, av, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, nsweeps: int, approx_lambda: bool, bv=None,
    compute_dtype=None,
):
    """The whole-level folded-coefficient colour passes on VALUES — the
    body of the resident kernel, reusable by any kernel that holds a full
    level in VMEM (resident_relax, and the fused coarse-depth tower of
    ops/coarse_tower.py)."""
    cdt = s.dtype if compute_dtype is None else jnp.dtype(compute_dtype)
    fdt = (
        jnp.float32
        if (cdt == jnp.bfloat16 or s.dtype == jnp.bfloat16)
        else s.dtype
    )
    # folded-coefficient passes over ALL three axes (the whole level is
    # resident, so even x edges fold — no explicit ghost handling left);
    # measured 2.1x on the pass cost vs per-pass masked edge selects.
    # Folding (the lambda reciprocal + rhs scaling) computes in >= f32 even
    # under a reduced compute_dtype — see _slab_passes.
    P, pab, k_uc, t_rhs = _fold_coefs(
        s.shape, fdt, rv.astype(fdt), av.astype(fdt), kinds=kinds, rho=rho,
        alpha=alpha, beta=beta, dx=dx, approx_lambda=approx_lambda,
        axes=(0, 1, 2), bv=None if bv is None else bv.astype(fdt),
    )
    out_dtype = s.dtype
    if cdt != fdt:
        cast = lambda x: None if x is None else x.astype(cdt)  # noqa: E731
        P, k_uc, t_rhs = cast(P), cast(k_uc), cast(t_rhs)
        pab = {ax: (cast(a), cast(b)) for ax, (a, b) in pab.items()}
    s = s.astype(cdt)
    par0 = _parity(s.shape, cdt, 0, base)
    pars = (par0, (1.0 - par0).astype(cdt))
    for p in range(2 * nsweeps):
        acc = k_uc * s + t_rhs
        for axis in (0, 1, 2):
            pa, pb = pab[axis]
            vp = jnp.roll(s, -1, axis)
            vm = jnp.roll(s, 1, axis)
            acc = (acc + P * (vp + vm) if pa is None
                   else acc + pa * vp + pb * vm)
        s = acc + pars[p & 1] * (s - acc)
    return s.astype(out_dtype)


def resident_residual_values(
    s, rv, av, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    bv=None,
):
    """res = rhs - L(u) on whole-level VALUES (body of the resident
    residual kernel; reused by the coarse-depth tower)."""
    inv_dx2 = 1.0 / (dx * dx)
    b_inv = beta * inv_dx2
    if bv is not None:
        b_inv = b_inv * bv
    lap = (_axis_neighbour_sum(s, 0, kinds, rho)
           + _yz_neighbour_sum(s, kinds, rho) - 6.0 * s)
    return rv - (alpha * av * s - b_inv * lap)


def _resident_relax_kernel(
    u_ref, rhs_ref, a_ref, *refs,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, nsweeps: int, approx_lambda: bool, with_b: bool = False,
    compute_dtype=None,
):
    if with_b:
        b_ref, o_ref = refs
        bv = b_ref[...]
    else:
        (o_ref,) = refs
        bv = None
    out = resident_relax_values(
        u_ref[...], rhs_ref[...], a_ref[...],
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, nsweeps=nsweeps, approx_lambda=approx_lambda, bv=bv,
        compute_dtype=compute_dtype,
    )
    o_ref[...] = out.astype(o_ref.dtype)


def _resident_residual_kernel(
    u_ref, rhs_ref, a_ref, *refs,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    with_b: bool = False,
):
    if with_b:
        b_ref, o_ref = refs
        bv = b_ref[...]
    else:
        (o_ref,) = refs
        bv = None
    o_ref[...] = resident_residual_values(
        u_ref[...], rhs_ref[...], a_ref[...],
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx, bv=bv,
    )


def _resident_call(kern_fn, u, rhs, a, interpret, b=None, **kw):
    kern = functools.partial(kern_fn, with_b=b is not None, **kw)
    args = (u, rhs, a) if b is None else (u, rhs, a, b)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "interpret", "approx_lambda", "compute_dtype"),
)
def resident_relax(
    u, rhs, a, b=None, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, interpret: bool = False, approx_lambda: bool = False,
    compute_dtype=None,
):
    """nsweeps full sweeps with the whole level pinned in VMEM: one launch,
    one read + one write of each array regardless of nsweeps. Optional
    variable bCoef `b` (cell-centred Laplacian multiplier, the reference's
    general-b GSRB kernel VariableCoeffPoissonOperatorF.ChF:56-139) folds
    into the per-launch P coefficient field."""
    return _resident_call(
        _resident_relax_kernel, u, rhs, a, interpret, b=b,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), nsweeps=nsweeps, approx_lambda=approx_lambda,
        compute_dtype=compute_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("kinds", "rho", "alpha", "beta", "dx", "interpret"),
)
def resident_residual(
    u, rhs, a, b=None, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    interpret: bool = False,
):
    """res = rhs - L(u) with homogeneous ghosts, whole level in VMEM;
    optional variable bCoef as in resident_relax."""
    return _resident_call(
        _resident_residual_kernel, u, rhs, a, interpret, b=b,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
    )


# --------------------------------------------------------------------------
# dispatch helpers
# --------------------------------------------------------------------------


def _padded_row_bytes(ny: int, nz: int, itemsize: int) -> int:
    """Bytes of one x-row as tiled in VMEM ((8,128) f32 tiles)."""
    pad = lambda v, m: -(-v // m) * m
    return pad(ny, 8) * pad(nz, 128) * itemsize


def resident_supported(shape, itemsize: int = 4, extra_arrays: int = 0) -> bool:
    """Level fits the resident kernels: whole arrays + temporaries in VMEM.
    Mosaic pads the trailing dims to (8,128) tiles, so tiny nz wastes VMEM
    but still compiles. `extra_arrays` charges additional resident operands
    (the variable-bCoef stream)."""
    nx, ny, nz = shape
    if nx < 4 or ny < 4 or nz < 4:
        return False
    ws = (_RESIDENT_WS_ARRAYS + extra_arrays) * nx * _padded_row_bytes(
        ny, nz, itemsize
    )
    return ws <= _RESIDENT_CAP


def slab_supported(shape, bx: int, nsweeps: int) -> bool:
    """Shapes the multisweep slab kernel accepts: the manual sliced HBM DMA
    needs the lane (last) dim aligned to 128 and sublanes to 8; bx must
    divide nx and cover the 2*nsweeps halo; the working set must fit."""
    nx, ny, nz = shape
    H = 2 * nsweeps
    if ny % 8 or nz % 128 or nx % bx or bx < H:
        return False
    ws = _SLAB_WS_ROWS * (bx + 2 * H) * ny * nz * 4
    return ws <= VMEM_LIMIT


def plan_chunks(n: int, max_chunk: int) -> list[int]:
    """Split n sweeps into near-equal chunks of at most max_chunk (fewest
    launches, balanced so no tiny trailing chunk inflates the halo work)."""
    if n <= 0:
        return []
    k = -(-n // max_chunk)
    lo_sz, extra = divmod(n, k)
    return [lo_sz + (1 if i < extra else 0) for i in range(k)]


# --------------------------------------------------------------------------
# 2-D tiled multisweep: (x, y)-blocked slabs for shapes whose full-row
# working set exceeds VMEM (512^3-class levels)
# --------------------------------------------------------------------------


def _pad_xy(u, rhs, a, H: int, kinds: FaceKinds, rho: float):
    """(nx+2H, ny+2H, nz) copies with halo pads, so every tile's slab is a
    UNIFORM 2-D slice (x start free, y start 8-aligned via by) — no
    edge-case DMA branches.

    x pads: one-ring ghost replica (edge tiles refresh the true ghost row
    per pass) or the periodic wrap. y pads: periodic wrap, or zeros — the
    folded y coefficients (_fold_coefs axis_info) are a one-way barrier at
    the domain face, so out-of-domain y rows never reach the interior.
    rhs/aCoef pad with zeros (aCoef = 0 keeps lambda finite); the pads
    cost one ~N-cell copy per launch, amortised over the fused sweeps."""
    nx, ny, nz = u.shape

    def wrap(x, axis):
        sl = [slice(None)] * 3
        sh = [slice(None)] * 3
        sl[axis], sh[axis] = slice(-H, None), slice(None, H)
        return jnp.concatenate([x[tuple(sl)], x, x[tuple(sh)]], axis=axis)

    def zpad(x, axis):
        shape = list(x.shape)
        shape[axis] = H
        z = jnp.zeros(shape, x.dtype)
        return jnp.concatenate([z, x, z], axis=axis)

    if kinds[1][0] == PERIODIC:
        # periodic halo rows are REAL cells whose redundant updates feed
        # the interior — rhs/aCoef must wrap too (as _x_pads does)
        uy, ry, ay = wrap(u, 1), wrap(rhs, 1), wrap(a, 1)
    else:
        uy, ry, ay = zpad(u, 1), zpad(rhs, 1), zpad(a, 1)
    if kinds[0][0] == PERIODIC:
        ux, rx, ax = wrap(uy, 0), wrap(ry, 0), wrap(ay, 0)
    else:
        lo = _ghost(kinds[0][0], uy[:1], uy[1:2], rho)
        hi = _ghost(kinds[0][1], uy[-1:], uy[-2:-1], rho)
        ux = jnp.concatenate(
            [jnp.broadcast_to(lo, (H,) + uy.shape[1:]), uy,
             jnp.broadcast_to(hi, (H,) + uy.shape[1:])], axis=0)
        rx, ax = zpad(ry, 0), zpad(ay, 0)
    return ux, rx, ax


def tiled_padless_ok(shape, bx: int, by: int, nsweeps: int,
                     kinds: FaceKinds) -> bool:
    """Whether the prepad-free tiled variant applies: non-periodic y (the
    wrap columns of a periodic y edge live on the far side of the array and
    only the full prepad can deliver them to a corner tile), 8-aligned halo
    depth (2H is the sublane offset of the in-kernel y fixup slices), and
    at least two tiles per axis (so lo/hi edge cases never coincide)."""
    nx, ny, _ = shape
    H = 2 * nsweeps
    return (
        kinds[1][0] != PERIODIC
        and H % 8 == 0
        and nx >= bx + 2 * H
        and ny >= by + 2 * H
        and nx // bx >= 2
        and ny // by >= 2
    )


def _tiled_dma(action: str, slot, tt, triples, sems, *, bx: int, by: int,
               H: int, nblk_x: int, nblk_y: int, nx: int, ny: int):
    """Start or wait the DMAs assembling tile `tt`'s three (Rx, Ry, nz)
    VMEM slabs straight from the UNPADDED arrays (the prepad-free path):

    * y: one clamped window [clip(j*by-H, 0, ny-Ry), +Ry) per segment —
      edge tiles load a window shifted inward and the kernel fixes the
      alignment with static slices + zero fill (non-periodic y only).
    * x: edge tiles take their out-of-domain rows from the (2H, ny, nz)
      side-pad arrays (ghost replicas / wraps / shard-neighbour rows),
      exactly the x-slab kernel's _load_slabs scheme.

    `action` mirrors the same branch structure for start and wait so the
    double-buffered prefetch pairs every start with its wait."""
    Rx, Ry = bx + 2 * H, by + 2 * H
    nby = jnp.int32(nblk_y)
    i, j = tt // nby, tt % nby
    y0d = j * jnp.int32(by) - jnp.int32(H)
    # clip bounds must be strong i32: a weak python 0 promotes the clip
    # to i64 under jax_enable_x64 and Mosaic's convert rule recurses
    # forever on i64 (same pin as _tiled_kernel's program_id note)
    y0c = pl.multiple_of(
        _i32(jnp.clip(y0d, jnp.int32(0), jnp.int32(ny - Ry))), 8
    )

    def seg(k, src, dst):
        cp = pltpu.make_async_copy(
            src, dst, sems.at[_i32(slot) * jnp.int32(6) + jnp.int32(k)]
        )
        (cp.start if action == "start" else cp.wait)()

    @pl.when(i == 0)
    def _():
        for ai, (hbm, pad, vmem) in enumerate(triples):
            seg(2 * ai, pad.at[pl.ds(0, H), pl.ds(y0c, Ry)],
                vmem.at[slot, pl.ds(0, H)])
            seg(2 * ai + 1, hbm.at[pl.ds(0, bx + H), pl.ds(y0c, Ry)],
                vmem.at[slot, pl.ds(H, bx + H)])

    @pl.when(i == nblk_x - 1)
    def _():
        for ai, (hbm, pad, vmem) in enumerate(triples):
            seg(2 * ai, hbm.at[pl.ds(nx - bx - H, bx + H), pl.ds(y0c, Ry)],
                vmem.at[slot, pl.ds(0, bx + H)])
            seg(2 * ai + 1, pad.at[pl.ds(H, H), pl.ds(y0c, Ry)],
                vmem.at[slot, pl.ds(bx + H, H)])

    if nblk_x > 2:
        @pl.when((i > 0) & (i < nblk_x - 1))
        def _():
            for ai, (hbm, pad, vmem) in enumerate(triples):
                x0 = pl.multiple_of(
                    _i32(i * jnp.int32(bx) - jnp.int32(H)), math.gcd(bx, H)
                )
                seg(2 * ai, hbm.at[pl.ds(x0, Rx), pl.ds(y0c, Ry)],
                    vmem.at[slot])


def _tiled_padless_kernel(
    meta_ref, u_hbm, upad, r_hbm, rpad, a_hbm, apad, o_ref,
    u_v, r_v, a_v, sems, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, by: int, nblk_x: int, nblk_y: int, nx: int, ny: int,
    nsweeps: int, approx_lambda: bool, compute_dtype=None,
):
    """Prepad-free tiled multisweep: same double-buffered grid walk as
    _tiled_kernel, but the slabs assemble from the unpadded arrays + tiny
    x side pads (VERDICT r2 weak #3: the full xy-prepad held ~3 extra
    level-sized arrays and OOM'd 768^3 on one chip; peak is now the 3
    operands + output)."""
    H = 2 * nsweeps
    t = _i32(pl.program_id(0))
    nblk = nblk_x * nblk_y
    nby = jnp.int32(nblk_y)
    dma = functools.partial(
        _tiled_dma, triples=[(u_hbm, upad, u_v), (r_hbm, rpad, r_v),
                             (a_hbm, apad, a_v)],
        sems=sems, bx=bx, by=by, H=H, nblk_x=nblk_x, nblk_y=nblk_y,
        nx=nx, ny=ny,
    )

    @pl.when(t == 0)
    def _():
        dma("start", jnp.int32(0), t)

    @pl.when(t + jnp.int32(1) < jnp.int32(nblk))
    def _():
        tn = t + jnp.int32(1)
        dma("start", tn % jnp.int32(2), tn)

    dma("wait", t % jnp.int32(2), t)

    slot = t % jnp.int32(2)
    i, j = t // nby, t % nby
    ylo, yhi = j == 0, j == nblk_y - 1

    def fix_y(arr):
        """Shift the clamped-window load into halo alignment: edge tiles
        loaded [0, Ry) / [ny-Ry, ny) instead of [j*by-H, ...); out-of-
        domain y columns become zeros (the folded y coefficients are a
        one-way barrier at the domain face, as the legacy prepad's zpad).
        Both shifts are computed unconditionally and selected with a
        BROADCAST predicate: a scalar-predicate lax.cond over vectors
        lowers to arith.select, which Mosaic cannot legalize."""
        z = jnp.zeros(arr.shape[:1] + (H,) + arr.shape[2:], arr.dtype)
        lo_shift = jnp.concatenate([z, arr[:, : by + H]], axis=1)
        arr = jnp.where(jnp.broadcast_to(ylo, arr.shape), lo_shift, arr)
        hi_shift = jnp.concatenate([arr[:, H:], z], axis=1)
        return jnp.where(jnp.broadcast_to(yhi, arr.shape), hi_shift, arr)

    s = fix_y(u_v[slot])
    rv = fix_y(r_v[slot])[1:-1]
    av = fix_y(a_v[slot])[1:-1]
    first = (i == 0) & (meta_ref[0] != 0)
    last = (i == nblk_x - 1) & (meta_ref[1] != 0)
    s = _slab_passes(
        s, rv, av, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, bx=bx, nsweeps=nsweeps, approx_lambda=approx_lambda,
        first=first, last=last, i0_off=i * bx - H + 1 + meta_ref[2],
        y_info=(j * by - H + meta_ref[3], ny), compute_dtype=compute_dtype,
    )
    o_ref[...] = s[H:-H, H:-H].astype(o_ref.dtype)


def _tiled_kernel(
    meta_ref, u_hbm, r_hbm, a_hbm, o_ref, u_v, r_v, a_v, sems, *,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, by: int, nblk_x: int, nblk_y: int, ny: int,
    nsweeps: int, approx_lambda: bool, compute_dtype=None,
):
    """Grid is LINEARISED (one axis, nblk_x*nblk_y steps) so the kernel
    can double-buffer manually: tile t+1's three slabs DMA while tile t
    computes its 2S colour passes (the serial start-wait-compute version
    measured ~40% slower at 512^3 — DMA was never hidden)."""
    H = 2 * nsweeps
    # program_id is WEAKLY typed: under jax_enable_x64 any arithmetic
    # with a python int promotes to i64, which Mosaic cannot lower
    # (its convert rule recurses) — pin everything to strong int32
    t = _i32(pl.program_id(0))
    nblk = nblk_x * nblk_y
    nby = jnp.int32(nblk_y)
    Rx, Ry = bx + 2 * H, by + 2 * H

    def copies(slot, tt):
        i, j = tt // nby, tt % nby
        x0 = _i32(i * jnp.int32(bx))
        # y slices the SUBLANE dim of the padded array: starts are j*by,
        # 8-aligned by construction (by % 8 == 0) — assert it for Mosaic
        y0 = pl.multiple_of(_i32(j * jnp.int32(by)), math.gcd(by, 8))
        return [
            pltpu.make_async_copy(
                h.at[pl.ds(x0, Rx), pl.ds(y0, Ry)], v.at[slot],
                sems.at[_i32(slot * jnp.int32(3) + jnp.int32(k))],
            )
            for k, (h, v) in enumerate(
                [(u_hbm, u_v), (r_hbm, r_v), (a_hbm, a_v)]
            )
        ]

    @pl.when(t == 0)
    def _():
        for c in copies(jnp.int32(0), t):
            c.start()

    @pl.when(t + jnp.int32(1) < jnp.int32(nblk))
    def _():
        tn = t + jnp.int32(1)
        for c in copies(tn % jnp.int32(2), tn):
            c.start()

    for c in copies(t % jnp.int32(2), t):
        c.wait()

    slot = t % jnp.int32(2)
    i, j = t // nby, t % nby
    s = u_v[slot]              # logical x [i*bx-H, ...), y [j*by-H, ...)
    rv = r_v[slot, 1:-1]
    av = a_v[slot, 1:-1]
    # meta (SMEM, int32 (4,)): [x_lo_edge, x_hi_edge, x_off, y_off] —
    # edges are 0 at shard seams (halo pads carry real neighbour rows, no
    # ghost refresh); x_off/y_off place the shard in the global frame,
    # keeping the GSRB checkerboard AND the folded y domain-face barrier
    # global under sharding (`ny` is the GLOBAL y extent: the fold fires
    # only where y_off + local index hits 0 or ny-1 — a y seam never does)
    first = (i == 0) & (meta_ref[0] != 0)
    last = (i == nblk_x - 1) & (meta_ref[1] != 0)
    s = _slab_passes(
        s, rv, av, kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=base, bx=bx, nsweeps=nsweeps, approx_lambda=approx_lambda,
        first=first, last=last, i0_off=i * bx - H + 1 + meta_ref[2],
        y_info=(j * by - H + meta_ref[3], ny), compute_dtype=compute_dtype,
    )
    o_ref[...] = s[H:-H, H:-H].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "bx", "by", "interpret", "approx_lambda",
                     "compute_dtype"),
)
def multisweep_relax_tiled(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, by: int, interpret: bool = False,
    approx_lambda: bool = False, halo=None, compute_dtype=None,
):
    """Temporally-blocked GSRB for levels too large for full-row slabs:
    the grid tiles (x, y) with a 2H-deep halo in both, loaded as one
    uniform 2-D slice of the xy-prepadded arrays. Traffic per sweep is
    ~(3*(bx+2H)*(by+2H)/(bx*by) + 1)/S + pad-copy/S streams — at
    bx=by=32, S=4 that is ~2.4 streams vs 10 for the 1-sweep fallback
    this replaces at 512^3.

    `halo = (upad, rpad, apad, meta)` runs the sharded (x-decomposed)
    variant inside shard_map: the (2H, ny, nz) pads carry the neighbour
    shards' rows ([:H] below, [H:] above) instead of ghost replicas, and
    meta = [lo_edge, hi_edge, x_off] flags true domain faces / the
    shard's global x origin (as multisweep_relax's halo contract)."""
    nx, ny, nz = u.shape
    H = 2 * nsweeps
    assert nx % bx == 0 and ny % by == 0 and by % 8 == 0 and nz % 128 == 0
    # sublane slab extent by + 2H must be 8-aligned -> even nsweeps only
    assert nsweeps % 2 == 0, nsweeps
    nblk_x, nblk_y = nx // bx, ny // by
    Rx, Ry = bx + 2 * H, by + 2 * H

    if tiled_padless_ok(u.shape, bx, by, nsweeps, kinds):
        # prepad-free variant: peak HBM footprint = operands + output
        # (the xy-prepad held ~3 extra level-sized copies; 768^3 OOM'd)
        if halo is None:
            upad, rpad, apad = _x_pads(u, rhs, a, H, kinds, rho)
            meta = jnp.array([1, 1, 0, 0], jnp.int32)
        else:
            upad, rpad, apad, meta = halo
            assert upad.shape == (2 * H, ny, nz), (upad.shape, H)
        kern = functools.partial(
            _tiled_padless_kernel,
            kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
            base=sum(lo), bx=bx, by=by, nblk_x=nblk_x, nblk_y=nblk_y,
            nx=nx, ny=ny, nsweeps=nsweeps, approx_lambda=approx_lambda,
            compute_dtype=compute_dtype,
        )
        return pl.pallas_call(
            kern,
            grid=(nblk_x * nblk_y,),
            in_specs=[pl.BlockSpec((4,), lambda t: (jnp.int32(0),),
                                   memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
            out_specs=pl.BlockSpec(
                (bx, by, nz),
                lambda t: (_i32(t) // jnp.int32(nblk_y),
                           _i32(t) % jnp.int32(nblk_y), jnp.int32(0)),
            ),
            out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, Rx, Ry, nz), u.dtype),
                pltpu.VMEM((2, Rx, Ry, nz), u.dtype),
                pltpu.VMEM((2, Rx, Ry, nz), u.dtype),
                pltpu.SemaphoreType.DMA((12,)),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT
            ),
            interpret=interpret,
        )(meta, u, upad, rhs, rpad, a, apad)

    if halo is None:
        up, rp, ap = _pad_xy(u, rhs, a, H, kinds, rho)
        meta = jnp.array([1, 1, 0, 0], jnp.int32)
    else:
        upad, rpad, apad, meta = halo
        assert upad.shape == (2 * H, ny, nz), (upad.shape, H)

        def ypad(x, pad_periodic):
            if kinds[1][0] == PERIODIC and pad_periodic:
                return jnp.concatenate(
                    [x[:, -H:], x, x[:, :H]], axis=1)
            z = jnp.zeros((x.shape[0], H, nz), x.dtype)
            return jnp.concatenate([z, x, z], axis=1)

        def with_halo(body, pad, pad_periodic):
            by_ = ypad(body, pad_periodic)
            pd = ypad(pad, pad_periodic)
            return jnp.concatenate([pd[:H], by_, pd[H:]], axis=0)

        up = with_halo(u, upad, True)
        rp = with_halo(rhs, rpad, True)
        ap = with_halo(a, apad, True)
    return _tiled_pre_call(
        up, rp, ap, meta, ny_global=ny, nsweeps=nsweeps, kinds=kinds,
        rho=rho, alpha=alpha, beta=beta, dx=dx, lo=lo, bx=bx, by=by,
        interpret=interpret, approx_lambda=approx_lambda,
        compute_dtype=compute_dtype,
    )


def _tiled_pre_call(
    up, rp, ap, meta, *, ny_global: int, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, by: int, interpret: bool, approx_lambda: bool,
    compute_dtype,
):
    """pallas_call of _tiled_kernel on (nx+2H, ny+2H, nz) PREPADDED
    operands: the pads carry ghost replicas / periodic wraps (unsharded)
    or real neighbour-shard data at seams (the 2-D pencil production
    path, parallel/halo.sharded_relax_2d). meta int32 (4,) =
    [x_lo_edge, x_hi_edge, x_off, y_off] places the local array in the
    global frame; `ny_global` is the GLOBAL y extent the folded y
    domain-face barrier fires against."""
    H = 2 * nsweeps
    nxp, nyp, nz = up.shape
    nx, ny = nxp - 2 * H, nyp - 2 * H
    assert nx % bx == 0 and ny % by == 0 and by % 8 == 0 and nz % 128 == 0
    assert nsweeps % 2 == 0, nsweeps
    nblk_x, nblk_y = nx // bx, ny // by
    kern = functools.partial(
        _tiled_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, by=by, nblk_x=nblk_x, nblk_y=nblk_y,
        ny=ny_global, nsweeps=nsweeps, approx_lambda=approx_lambda,
        compute_dtype=compute_dtype,
    )
    Rx, Ry = bx + 2 * H, by + 2 * H
    return pl.pallas_call(
        kern,
        grid=(nblk_x * nblk_y,),
        in_specs=[pl.BlockSpec((4,), lambda t: (jnp.int32(0),),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(
            (bx, by, nz),
            # strong-i32 arithmetic: a weak `t // int` promotes to i64
            # under jax_enable_x64 and Mosaic cannot lower the convert
            lambda t: (_i32(t) // jnp.int32(nblk_y),
                       _i32(t) % jnp.int32(nblk_y), jnp.int32(0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), up.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Rx, Ry, nz), up.dtype),
            pltpu.VMEM((2, Rx, Ry, nz), up.dtype),
            pltpu.VMEM((2, Rx, Ry, nz), up.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(meta, up, rp, ap)


@functools.partial(
    jax.jit,
    static_argnames=("ny_global", "nsweeps", "kinds", "rho", "alpha", "beta",
                     "dx", "lo", "bx", "by", "interpret", "approx_lambda",
                     "compute_dtype"),
)
def multisweep_relax_tiled_pre(
    u_pre, rhs_pre, a_pre, meta, *, ny_global: int, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, by: int, interpret: bool = False,
    approx_lambda: bool = False, compute_dtype=None,
):
    """Temporally-blocked tiled GSRB on PREPADDED operands — the entry the
    2-D (x, y) pencil sharded smoother calls inside shard_map with every
    pad already holding the neighbour shards' rows/columns/corners
    (exchanged via ppermute; parallel/halo.sharded_relax_2d). Bitwise-equal
    to the unsharded multisweep_relax_tiled at the same tile geometry: the
    trapezoidal halo recompute evaluates seam cells exactly as the owning
    shard does, and meta's global offsets keep the checkerboard and the
    folded y-face barrier in the global frame."""
    return _tiled_pre_call(
        u_pre, rhs_pre, a_pre, meta, ny_global=ny_global, nsweeps=nsweeps,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx, lo=lo,
        bx=bx, by=by, interpret=interpret, approx_lambda=approx_lambda,
        compute_dtype=compute_dtype,
    )


def tiled_supported(shape, bx: int, by: int, nsweeps: int) -> bool:
    """Shapes the 2-D tiled kernel accepts: whole lanes (nz % 128), tile
    dims dividing the level, by 8-aligned (sublane slicing), EVEN nsweeps
    (the sublane slab extent by + 4*nsweeps must stay 8-aligned), and the
    3-slab + temporaries working set within VMEM."""
    nx, ny, nz = shape
    H = 2 * nsweeps
    if nz % 128 or nx % bx or ny % by or by % 8 or bx < 4 or nsweeps % 2:
        return False
    # +3 tile-volumes for the second DMA buffer set (double-buffering)
    ws = (_SLAB_WS_ROWS + 3) * (bx + 2 * H) * (by + 2 * H) * nz * 4
    return ws <= VMEM_LIMIT


def tiled_plan(shape, nsweeps: int):
    """(bx, by) for the tiled kernel, or None. Prefer square-ish tiles
    big enough to amortise the halo (bx, by >= 2H) while fitting VMEM."""
    for b in (64, 48, 32, 24, 16, 8):
        if tiled_supported(shape, b, b, nsweeps) and b >= 2 * nsweeps:
            return (b, b)
    return None
