"""Time-skewed (wavefront) GSRB multisweep kernel: redundancy-free
temporal blocking for non-periodic-x levels.

The round-2..4 temporally-blocked kernels (ops/fused_sweeps) pay the
trapezoidal halo tax twice: every launch RE-READS (w+2)/w of each array
from HBM and RE-COMPUTES (w+2)/w of every colour pass, because each block
must rebuild the pass staircase its neighbours own. Round-5 measurement
(scripts/_probe_fold5_ab.py, docs/PERF.md) showed the 256^3 smoother is
pinned to the VPU wall at that redundancy — the fastest achievable
halo-recompute configuration (width 2, S=4) computes every cell twice per
pass and cannot reach the 8e10 DOF/s target.

This kernel removes the redundancy instead of optimising it. The grid
walks x blocks SEQUENTIALLY (Pallas TPU grids are sequential on a core
and scratch persists across steps), carrying the pass staircase between
blocks in VMEM:

  * `s_buf` carries the 2S-row tail whose rows sit at descending pass
    states (row B-1-j at state j) — the classic 1-D time-skewing
    wavefront;
  * `d_ref` carries, for each pass p, the pre-update (state-p) value of
    the boundary row the next block's pass p must read as its left
    neighbour (the one value in-place Gauss-Seidel overwrites);
  * pass p of block [A, B) updates rows [A-p-1, B-p-1) — every row gets
    every pass EXACTLY ONCE across the launch, and each array is read
    once and written once per S sweeps: both the VPU redundancy and the
    HBM read amplification are 1.0 (the halo-recompute families pay
    (w+2)/w >= 1.5 on both).

The per-cell arithmetic replicates fused_sweeps._slab_passes VERBATIM
(same folded coefficients, same expression association, same per-pass
x-face ghost value computed from the current interior — the reference's
per-colour BC refresh, VariableCoeffPoissonOperator.cpp:290-330). The
result matches the halo-recompute kernels to 1-2 ulp at the same chunk
size (tests/test_wavefront.py, atol 1e-13 in f64): the expression trees
are identical but the compiler's FMA contraction differs across slice
shapes — the same reorder class as the round-3 window-shrink finding
(docs/PERF.md), and far below smoother-grade significance (the f64
outer Krylov absorbs it; flagship iteration counts are unchanged,
tests/test_reference_config.py).

Reference kernel this implements: GSRBHELMHOLTZVC3D,
VariableCoeffPoissonOperatorF.ChF:56-139 (S sweeps fused per launch).

Limits: non-periodic x only (the wavefront is sequential in x; a
periodic wrap would need the last block's state before the first block
finishes — periodic-x levels keep the halo-recompute families), and
single-device only (a shard seam would serialise shards; sharded levels
keep the ppermute halo-pad kernels).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mg_ic_code_tpu.ops.fused_sweeps import (
    VMEM_LIMIT, _fold_coefs, _fold_coefs_flat, _i32, _parity,
)
from mg_ic_code_tpu.ops.ghosts import PERIODIC, FaceKinds, ghost_plane

# calibrated working-set model (see wavefront_supported): live window
# fields (s, rhs/a windows + tails, 7 fold fields, 2 parity fields,
# pass temporaries) in units of W-row arrays
_WAVE_WS_ROWS = 16.0


def _in_dma(j, slot, srcs, bufs, sems, *, bx: int):
    """Start or wait the 3 fresh-row copies for block j into slot."""
    off = pl.multiple_of(_i32(j) * jnp.int32(bx), bx)
    return [
        pltpu.make_async_copy(
            src.at[pl.ds(off, bx)], buf.at[slot],
            sems.at[_i32(slot) * jnp.int32(3) + jnp.int32(k)],
        )
        for k, (src, buf) in enumerate(zip(srcs, bufs))
    ]


def _passes(
    s, d_old, P, axis_acc, k_uc, t_rhs, pars, *,
    kinds: FaceKinds, rho: float, bx: int, W: int, nsweeps: int,
    first_flag, extend_hi: bool, inject_lo_static: bool,
):
    """The 2*nsweeps skewed colour passes on the window value `s`
    (rows [A-2S, B)). Pass p updates rows [A-p-1, B-p-1) — or the
    extended range [A-p-1, nx) when `extend_hi` (the last block flushes
    the staircase tail in the same step, reading the hi-face ghost from
    the current interior). `axis_acc(acc, uc, P_s, lo_i, hi_i)` adds the
    non-x neighbour terms (layout-specific: y/z rolls in 3-D, lane
    shifts in the flat layout). Returns (new s, d_new row list).

    The per-cell expression tree is kept IDENTICAL to
    fused_sweeps._slab_passes / _flat_passes (equality lock)."""
    H = 2 * nsweeps
    d_new = []
    for p in range(2 * nsweeps):
        lo_i = H - p - 1
        # window: left carry row (state-p value of A-p-2) + current rows
        win = jnp.concatenate([d_old[p:p + 1], s[lo_i:]], axis=0) \
            if extend_hi else jnp.concatenate(
                [d_old[p:p + 1], s[lo_i:W - p]], axis=0)
        if extend_hi:
            # hi-face ghost from the CURRENT state-p interior — exactly
            # the value the halo-recompute kernels' per-pass ghost
            # refresh stores (levelGSRB re-applies BCs between colours)
            g_hi = ghost_plane(kinds[0][1], s[-1:], s[-2:-1], rho)
            win = jnp.concatenate([win, g_hi], axis=0)
        if inject_lo_static or first_flag is not None:
            # the lo-face ghost row (global x = -1) sits at win row p+1;
            # derive it from the current global rows 0, 1 (win p+2, p+3)
            g_lo = ghost_plane(kinds[0][0], win[p + 2:p + 3],
                               win[p + 3:p + 4], rho)
            row = (g_lo if inject_lo_static
                   else jnp.where(first_flag, g_lo, win[p + 1:p + 2]))
            win = jnp.concatenate(
                [win[:p + 1], row, win[p + 2:]], axis=0)
        if not extend_hi:
            # state-p value of row B-p-2 (win row bx), saved BEFORE the
            # update overwrites it: the next block's pass-p left carry
            d_new.append(win[bx:bx + 1])
        uc = win[1:-1]
        hi_i = lo_i + uc.shape[0]
        P_s, k_s, t_s = P[lo_i:hi_i], k_uc[lo_i:hi_i], t_rhs[lo_i:hi_i]
        acc = P_s * (win[2:] + win[:-2]) + k_s * uc + t_s
        acc = axis_acc(acc, uc, P_s, lo_i, hi_i)
        new = acc + pars[p & 1][lo_i:hi_i] * (uc - acc)
        # Mosaic rejects zero-extent vector slices: drop empty pieces
        # (lo_i == 0 on the final pass)
        pieces = ([s[:lo_i]] if lo_i > 0 else []) + [new] + (
            [] if extend_hi else [s[W - p - 1:]])
        s = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=0)
    return s, d_new


def _wavefront_kernel(
    u_hbm, r_hbm, a_hbm, *rest,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    base: int, bx: int, nblk: int, nx: int, nsweeps: int,
    approx_lambda: bool, compute_dtype=None, flat_yz=None,
):
    """`flat_yz = (ny, nz)` runs the flattened (nx, ny*nz) layout for
    lane-misaligned levels: the y/z neighbour terms become lane shifts
    with per-lane folded weights (fused_sweeps._fold_coefs_flat), exactly
    as multisweep_relax_flat's passes. The flat variant takes two extra
    (1, m) int32 inputs kidx/yidx (computed OUTSIDE the kernel: in-kernel
    integer %/Div lowers through Mosaic's convert rule, which recurses —
    the same pitfall the flat slab kernels avoid the same way)."""
    if flat_yz is None:
        (o_ref, s_buf, r_buf, a_buf, d_ref, u_n, r_n, a_n,
         in_sems, out_sem) = rest
        kidx_ref = yidx_ref = None
    else:
        (kidx_ref, yidx_ref, o_ref, s_buf, r_buf, a_buf, d_ref,
         u_n, r_n, a_n, in_sems, out_sem) = rest
    H = 2 * nsweeps
    W = bx + H
    i = _i32(pl.program_id(0))
    slot = i % jnp.int32(2)
    dma = functools.partial(
        _in_dma, srcs=(u_hbm, r_hbm, a_hbm), bufs=(u_n, r_n, a_n),
        sems=in_sems, bx=bx)

    @pl.when(i == 0)
    def _():
        for c in dma(i, jnp.int32(0)):
            c.start()

    @pl.when(i + jnp.int32(1) < jnp.int32(nblk))
    def _():
        for c in dma(i + jnp.int32(1), (i + jnp.int32(1)) % jnp.int32(2)):
            c.start()

    for c in dma(i, slot):
        c.wait()

    def body(last: bool):
        cdt = (u_n.dtype if compute_dtype is None
               else jnp.dtype(compute_dtype))
        fdt = (jnp.float32
               if (cdt == jnp.bfloat16 or u_n.dtype == jnp.bfloat16)
               else u_n.dtype)
        # assemble the window values: carried tail + fresh rows
        s = jnp.concatenate([s_buf[bx:], u_n[slot]], axis=0).astype(cdt)
        rwin = jnp.concatenate([r_buf[bx:], r_n[slot]], axis=0)
        awin = jnp.concatenate([a_buf[bx:], a_n[slot]], axis=0)
        cast = lambda x: None if x is None else x.astype(cdt)  # noqa: E731
        if flat_yz is None:
            P, pab, k_uc, t_rhs = _fold_coefs(
                (W,) + s.shape[1:], fdt, rwin.astype(fdt),
                awin.astype(fdt),
                kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
                approx_lambda=approx_lambda,
            )
            if cdt != fdt:
                P, k_uc, t_rhs = cast(P), cast(k_uc), cast(t_rhs)
                pab = {ax: (cast(a), cast(b)) for ax, (a, b) in pab.items()}
            par0 = _parity(
                (W,) + s.shape[1:], cdt, i * jnp.int32(bx) - H, base)

            def axis_acc(acc, uc, P_s, lo_i, hi_i):
                # IDENTICAL expression tree to fused_sweeps._slab_passes
                for axis in (1, 2):
                    pa, pb = pab[axis]
                    vp = jnp.roll(uc, -1, axis)
                    vm = jnp.roll(uc, 1, axis)
                    acc = (acc + P_s * (vp + vm) if pa is None
                           else acc + pa[lo_i:hi_i] * vp
                           + pb[lo_i:hi_i] * vm)
                return acc
        else:
            ny, nz = flat_yz
            kidx = kidx_ref[...]
            yidx = yidx_ref[...]
            P, weights, k_uc, t_rhs = _fold_coefs_flat(
                fdt, rwin.astype(fdt), awin.astype(fdt), kidx, yidx,
                ny=ny, nz=nz,
                kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
                approx_lambda=approx_lambda,
            )
            if cdt != fdt:
                P, k_uc, t_rhs = cast(P), cast(k_uc), cast(t_rhs)
                weights = {ax: (cast(a), cast(b))
                           for ax, (a, b) in weights.items()}
            ii = jax.lax.broadcasted_iota(jnp.int32, (W, ny * nz), 0)
            par0 = ((ii + _i32(i * jnp.int32(bx) - H) + yidx + kidx + base)
                    & 1).astype(cdt)

            def shift(x, k):  # result[f] = x[f + k]
                return jnp.roll(x, -k, axis=1)

            def axis_acc(acc, uc, P_s, lo_i, hi_i):
                # IDENTICAL expression tree to fused_sweeps._flat_passes
                for axis, idx, n_ax, step in ((2, kidx, nz, 1),
                                              (1, yidx, ny, nz)):
                    pa, pb = weights[axis]
                    vp = shift(uc, step)
                    vm = shift(uc, -step)
                    if pa is None:  # periodic: wrap selects
                        vp = jnp.where(idx == n_ax - 1,
                                       shift(uc, step - n_ax * step), vp)
                        vm = jnp.where(idx == 0,
                                       shift(uc, n_ax * step - step), vm)
                        acc = acc + P_s * (vp + vm)
                    else:
                        acc = acc + pa[lo_i:hi_i] * vp + pb[lo_i:hi_i] * vm
                return acc
        pars = (par0, (1.0 - par0).astype(cdt))
        d_old = d_ref[...].astype(cdt)
        s, d_new = _passes(
            s, d_old, P, axis_acc, k_uc, t_rhs, pars,
            kinds=kinds, rho=rho, bx=bx, W=W, nsweeps=nsweeps,
            first_flag=None if (last or nblk == 1) else (i == 0),
            extend_hi=last,
            inject_lo_static=last and nblk == 1,
        )
        s = s.astype(s_buf.dtype)
        s_buf[...] = s
        if not last:
            # carries for the next block: rhs/a window tails + the
            # pass-p boundary rows in-place GS overwrote
            r_buf[...] = rwin
            a_buf[...] = awin
            d_ref[...] = jnp.concatenate(d_new, axis=0).astype(d_ref.dtype)
        # completed rows [A-2S, B-2S) (block 0: clip below 0; the last
        # block has flushed the whole window tail too). The DMA is
        # started AND waited in-step: s_buf is single-buffered and the
        # next step overwrites it — a 2-slot staging copy could overlap
        # this 1-of-4 stream with the next block's passes (known,
        # unexploited: the kernel measured equal to the pipelined family
        # with the bound elsewhere, docs/PERF.md round 5).
        if last:
            if nblk == 1:
                cp = pltpu.make_async_copy(
                    s_buf.at[pl.ds(H, bx)], o_ref.at[pl.ds(0, bx)],
                    out_sem)
            else:
                off = pl.multiple_of(
                    _i32(i) * jnp.int32(bx) - jnp.int32(H),
                    math.gcd(bx, H))
                cp = pltpu.make_async_copy(
                    s_buf, o_ref.at[pl.ds(off, W)], out_sem)
            cp.start()
            cp.wait()
        else:
            # traced-uniform branch: block 0 writes bx-H rows, others bx
            cp_first = pltpu.make_async_copy(
                s_buf.at[pl.ds(H, bx - H)], o_ref.at[pl.ds(0, bx - H)],
                out_sem)
            off = pl.multiple_of(
                _i32(i) * jnp.int32(bx) - jnp.int32(H), math.gcd(bx, H))
            cp_mid = pltpu.make_async_copy(
                s_buf.at[pl.ds(jnp.int32(0), bx)],
                o_ref.at[pl.ds(off, bx)], out_sem)

            @pl.when(i == 0)
            def _():
                cp_first.start()
                cp_first.wait()

            @pl.when(i > 0)
            def _():
                cp_mid.start()
                cp_mid.wait()

    if nblk == 1:
        body(last=True)
    else:
        @pl.when(i < jnp.int32(nblk - 1))
        def _():
            body(last=False)

        @pl.when(i == jnp.int32(nblk - 1))
        def _():
            body(last=True)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "bx", "interpret", "approx_lambda", "compute_dtype"),
)
def wavefront_relax(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, interpret: bool = False, approx_lambda: bool = False,
    compute_dtype=None,
):
    """nsweeps full red+black GSRB sweeps in one launch with NO redundant
    compute and NO read amplification: each array is read once, the
    result written once, every colour pass computed exactly once per cell
    (time-skewed blocks; module docstring). Matches
    fused_sweeps.multisweep_relax to 1-2 ulp at the same nsweeps.

    Requires wavefront_supported(shape, bx, nsweeps, kinds)."""
    nx, ny, nz = u.shape
    H = 2 * nsweeps
    W = bx + H
    assert kinds[0][0] != PERIODIC, "wavefront is sequential in x"
    # bx >= 2H: the prologue ghost-injection window indexes rows p+3
    # (p < 2H) and multi-block output DMA needs a bx-H first block
    assert nx % bx == 0 and (bx >= 2 * H or bx == nx), (nx, bx, H)
    nblk = nx // bx
    kern = functools.partial(
        _wavefront_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, nx=nx, nsweeps=nsweeps,
        approx_lambda=approx_lambda, compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, ny, nz), u.dtype),      # s_buf
            pltpu.VMEM((W, ny, nz), u.dtype),      # r_buf
            pltpu.VMEM((W, ny, nz), u.dtype),      # a_buf
            pltpu.VMEM((H, ny, nz), u.dtype),      # d_ref
            pltpu.VMEM((2, bx, ny, nz), u.dtype),  # u_n
            pltpu.VMEM((2, bx, ny, nz), u.dtype),  # r_n
            pltpu.VMEM((2, bx, ny, nz), u.dtype),  # a_n
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(u, rhs, a)


@functools.partial(
    jax.jit,
    static_argnames=("nsweeps", "kinds", "rho", "alpha", "beta", "dx", "lo",
                     "bx", "interpret", "approx_lambda", "compute_dtype"),
)
def wavefront_relax_flat(
    u, rhs, a, *, nsweeps: int,
    kinds: FaceKinds, rho: float, alpha: float, beta: float, dx: float,
    lo, bx: int, interpret: bool = False, approx_lambda: bool = False,
    compute_dtype=None,
):
    """wavefront_relax in the flattened (nx, ny*nz) layout for levels
    whose nz breaks the 128-lane rule (e.g. the canonical bbox finest
    960x144x144 — 73% of all refined cells): y/z neighbours become lane
    shifts with per-lane folded weights, exactly multisweep_relax_flat's
    pass math (matched to 1-2 ulp, tests/test_wavefront.py). The x rows
    are the SUBLANE dim of the 2-D layout, so bx and the staircase depth
    2*nsweeps must be 8-aligned (flat_wavefront_supported)."""
    nx, ny, nz = u.shape
    m = ny * nz
    H = 2 * nsweeps
    W = bx + H
    assert kinds[0][0] != PERIODIC, "wavefront is sequential in x"
    assert (nx % bx == 0 and (bx >= 2 * H or bx == nx) and bx % 8 == 0
            and H % 8 == 0 and m % 128 == 0), (u.shape, bx, H)
    nblk = nx // bx
    uf, rf, af = (x.reshape(nx, m) for x in (u, rhs, a))
    f = jnp.arange(m, dtype=jnp.int32)
    kidx = (f % nz)[None]
    yidx = (f // nz)[None]
    kern = functools.partial(
        _wavefront_kernel,
        kinds=kinds, rho=rho, alpha=alpha, beta=beta, dx=dx,
        base=sum(lo), bx=bx, nblk=nblk, nx=nx, nsweeps=nsweeps,
        approx_lambda=approx_lambda, compute_dtype=compute_dtype,
        flat_yz=(ny, nz),
    )
    idx_spec = pl.BlockSpec((1, m), lambda i: (jnp.int32(0), jnp.int32(0)))
    out = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [idx_spec, idx_spec],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nx, m), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, m), u.dtype),      # s_buf
            pltpu.VMEM((W, m), u.dtype),      # r_buf
            pltpu.VMEM((W, m), u.dtype),      # a_buf
            pltpu.VMEM((H, m), u.dtype),      # d_ref
            pltpu.VMEM((2, bx, m), u.dtype),  # u_n
            pltpu.VMEM((2, bx, m), u.dtype),  # r_n
            pltpu.VMEM((2, bx, m), u.dtype),  # a_n
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(uf, rf, af, kidx, yidx)
    return out.reshape(nx, ny, nz)


def wavefront_supported(shape, bx: int, nsweeps: int,
                        kinds: FaceKinds | None) -> bool:
    """Shapes the wavefront kernel accepts: non-periodic x (sequential
    wavefront), lane/sublane-aligned DMA (nz % 128, ny % 8), bx dividing
    nx and at least double the 2*nsweeps staircase depth (a bx == H
    multi-block launch would give block 0 a zero-row output DMA; a
    single-block launch, bx == nx, is exempt), working set within VMEM."""
    nx, ny, nz = shape
    H = 2 * nsweeps
    if kinds is None or kinds[0][0] == PERIODIC:
        return False
    if ny % 8 or nz % 128 or nx % bx or bx < H:
        return False
    if bx < 2 * H and bx != nx:
        return False
    ws = _WAVE_WS_ROWS * (bx + H) * ny * nz * 4
    return ws <= VMEM_LIMIT


def flat_wavefront_supported(shape, bx: int, nsweeps: int,
                             kinds: FaceKinds | None) -> bool:
    """Flat-layout wavefront: flattened lanes tiling to 128; x rows are
    the sublane dim, so bx and the 2*nsweeps staircase must be 8-aligned
    (nsweeps multiples of 4 only); otherwise as wavefront_supported."""
    nx, ny, nz = shape
    m = ny * nz
    H = 2 * nsweeps
    if kinds is None or kinds[0][0] == PERIODIC:
        return False
    if m % 128 or nx % bx or bx < H or bx % 8 or H % 8:
        return False
    if bx < 2 * H and bx != nx:
        return False
    ws = _WAVE_WS_ROWS * (bx + H) * m * 4
    return ws <= VMEM_LIMIT


def wavefront_plan(shape, n: int, kinds: FaceKinds | None):
    """(nsweeps_per_launch, bx, flat) for the wavefront family, or None.
    Deepest feasible sweep chunk dividing n first (traffic per sweep is
    16/S bytes per cell — deeper is strictly better), smallest feasible
    bx (VMEM; traffic is bx-INDEPENDENT because the tail windows are
    carried in scratch, and more grid steps pipeline the fresh-row DMA
    better). The 3-D layout is preferred; lane-misaligned shapes fall to
    the flat layout (which restricts chunks to multiples of 4)."""
    # chunks are capped at 4 sweeps/launch: the skewed pass structure
    # unrolls 2S passes with per-pass shifted slices, and Mosaic compile
    # time at S=8 ran past 10 minutes on the probe shapes (production
    # nsmooth is 4, so deeper chunks only ever served the bench)
    nx = shape[0]

    def cands(H):
        # every divisor of nx >= the 2H staircase floor, smallest first
        # (VMEM; traffic is bx-independent), then the single-block form
        out = [b for b in range(2 * H, nx, 1) if nx % b == 0]
        return out + [nx]

    # no 1-sweep chunks: at S=1 the wavefront's 16/S = 16 B/cell-sweep is
    # WORSE than the pipelined families' ~7-10 (the skew only pays when
    # the staircase amortises) — odd sweep counts keep the round-4 ladder
    for s in (4, 2):
        if s > n or n % s:
            continue
        H = 2 * s
        for b in cands(H):
            if wavefront_supported(shape, b, s, kinds):
                return s, b, False
    if n % 4 == 0:  # flat chunks: 8-aligned staircase -> multiples of 4
        s, H = 4, 8
        for b in cands(H):
            if flat_wavefront_supported(shape, b, s, kinds):
                return s, b, True
    return None
