"""Regular-grid nested-dissection multifrontal solver (GRIDMF).

For matrices whose graph is an n-D structured grid (2-D or 3-D boxes of
cells, ``s`` unknowns per cell, stencil reach <= 1 cell incl. diagonals)
— e.g. FDM discretizations like the Brusselator PDE Jacobian (the
reference's flagship, russell_ode/examples/brusselator_pde_radau5.rs)
and the 2-D/3-D Laplacian benchmark operators — this is the
speed-of-light TPU design:

- **host symbolic**: recursive bisection of the grid by 1-cell-thick
  separator hyperplanes. Each axis is first padded to the smallest
  *perfectly splittable* virtual size ``P = 2^a * (leaf+1) - 1``, so
  every split is exact (``h = 2m + 1`` -> both children get exactly
  ``m``) and every node at a tree depth is CONGRUENT: one static front
  layout and one child->parent embedding map per (depth, side), shared
  across all nodes of the depth. All ghost cells lie beyond the real
  grid's high edges, so node footprints tile the virtual grid disjointly
  and a ghost position can never coincide with a real cell of another
  node. Front layouts are **union-trimmed**: an elim/shell offset is
  kept only if it lands inside the real grid for at least one node of
  the depth. Trimming is what makes 3-D feasible — an untrimmed
  Chebyshev shell of the root box would be ~7x the separator plane —
  and it also shrinks the top 2-D fronts (the root keeps no shell at
  all). Dropping is safe: an offset absent from a layout is out-of-grid
  for EVERY node, so its front rows/cols, Schur contributions and rhs
  entries are identically zero (induction from "ghost cells carry no
  matrix entries").
- **device numeric**: one batched dense pipeline per depth — assemble
  fronts (one static scatter-add of pre-summed entry values), invert the
  pivot block with ``splu._inv_block`` (recursive-Schur inverse, MUMPS
  ICNTL-style static pivot clamping), form the panel and Schur
  complement with batched MXU einsums, and extend-add children Schur
  complements into the parents with constant one-hot embedding matmuls.
  There are NO per-row gathers or scatters anywhere on the device —
  XLA:TPU's indexed row ops cost ~300ns each, which is what bounds the
  general SPLU engine; here every hot op is a large batched GEMM.
- **complex**: real/imag PLANES end to end (Karatsuba 3-mult products;
  complex einsum and complex indexed ops are pathologically slow on this
  backend); pivot-block inversion expands the planes to the real
  embedding K=[[R,-I],[I,R]], inverts, and keeps the planes of the
  result. log|det| is exact; the complex determinant phase is not
  recoverable from K (phase = 1), matching the SPLU contract.

Ghost padding is SAFE by construction: ghost cells never carry matrix
entries, so their Schur rows/cols stay exactly zero; ghost pivot slots
get a unit diagonal at assembly (logdet contribution 0) and ghost
positions that fall outside a parent's layout are dropped by the
embedding (their content is identically zero).

Reference role: the analyze/factorize/solve split of MUMPS
(interface_mumps.c JOB_ANALYZE/JOB_FACTORIZE/JOB_SOLVE) specialised to
regular grids; fill and flops match nested-dissection multifrontal
theory (O(n log n) fill / O(n^1.5) flops in 2-D, O(n^{4/3}) fill /
O(n^2) flops in 3-D).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse.ordering import idx32 as _idx32

from russell_tpu.sparse.splu import _inv_block

__all__ = ["GridMfPlan", "gridmf_analyze", "gridmf_factorize",
           "gridmf_solve", "gridmf_factorize_ooc", "gridmf_solve_ooc",
           "gridmf_store_gb", "gridmf_flops"]


# ---------------------------------------------------------------------------
# host symbolic phase
# ---------------------------------------------------------------------------


@dataclass
class _Level:
    """Static description of one congruent tree depth (host arrays)."""

    n_nodes: int
    ncell_front: int      # front cells (elim cells first, then shell)
    ncell_elim: int
    s: int                # vars per cell
    # entry assembly: unique flat positions into (n_nodes*F*F) and the
    # slice of the global pre-summed value array feeding them
    asm_idx: np.ndarray = None
    asm_off: int = 0
    asm_len: int = 0
    ghost_diag: np.ndarray = None        # flat positions getting +1.0
    elim_var: np.ndarray = None          # (n_nodes, e) global var or n (pad)
    # child->parent embedding: for each child keep position, the parent
    # front position (or -1 = dropped ghost overflow); one map per side
    emb: Optional[np.ndarray] = None     # (2, r_child_vars) into parent F

    @property
    def F(self):
        return self.ncell_front * self.s

    @property
    def e(self):
        return self.ncell_elim * self.s

    @property
    def r(self):
        return self.F - self.e


@dataclass
class GridMfPlan:
    """Symbolic output: congruent per-depth schedules, leaf level last
    in ``levels`` (device factorize iterates levels in REVERSE —
    elimination order, leaves first)."""

    n: int
    dims: Tuple[int, ...]   # real grid extents per axis (2-D or 3-D)
    s: int
    levels: List[_Level] = field(default_factory=list)  # depth 0 = root
    entry_perm: np.ndarray = None   # entries ordered by (depth, position)
    entry_seg: np.ndarray = None    # segment id per permuted entry
    n_uniq: int = 0
    pivot_epsilon: float = 1e-14


def _box_offsets(shape):
    """Row-major (dr, dc, ...) offsets of every cell in a box."""
    grids = np.meshgrid(*[np.arange(int(d)) for d in shape], indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=1).astype(np.int64)


def _elim_offsets(shape, axis, m, leaf):
    """Eliminated cells of a node: the whole box (leaf) or the
    1-cell-thick separator hyperplane at position ``m`` on ``axis``."""
    if leaf:
        return _box_offsets(shape)
    sub = list(shape)
    sub[axis] = 1
    off = _box_offsets(sub)
    off[:, axis] = m
    return off


def _shell_offsets(shape):
    """Chebyshev-distance-1 exterior cells of the box (the coupling set
    of its boundary under reach-1 stencils), row-major enumeration."""
    shape = np.asarray(shape, dtype=np.int64)
    infl = _box_offsets(shape + 2) - 1
    outside = np.any((infl < 0) | (infl >= shape[None, :]), axis=1)
    return infl[outside]


def _pad_axis(nreal: int, target: int):
    """Smallest perfectly-splittable virtual size ``P = 2^a*(l+1) - 1``
    covering ``nreal``, over leaf lengths ``l`` near ``target`` (minimal
    padding first, larger leaves on ties). A no-split axis (P = l =
    nreal) is only allowed when the axis already fits within the leaf
    range. Returns (P, l)."""
    best = None
    for l in range(2, max(2 * target, target + 8) + 1):
        if nreal <= l:
            cand = (nreal, nreal)
        else:
            a = 1
            while ((l + 1) << a) - 1 < nreal:
                a += 1
            cand = (((l + 1) << a) - 1, l)
        if best is None or (cand[0], -cand[1]) < (best[0], -best[1]):
            best = cand
    return best


def gridmf_analyze(n: int, rows, cols, grid,
                   leaf_cells: int = 32,
                   pivot_epsilon: float = 1e-14) -> GridMfPlan:
    """Symbolic phase. ``grid`` = (*dims, s) — 2-D ``(nr, nc, s)`` or
    3-D ``(n0, n1, n2, s)`` — with the species-major variable layout
    ``var = k*prod(dims) + row_major_cell`` (the natural layout of
    russell_tpu.ode.samples.brusselator_pde, pde.fdm and
    sparse.samples.laplacian_2d/3d). Raises ValueError if the entry
    pattern is not cell-local (stencil reach must be <= 1 cell in each
    direction; periodic wrap is rejected)."""
    grid = tuple(int(v) for v in grid)
    if len(grid) < 3:
        raise ValueError("grid hint must be (*dims, s) with >= 2 axes")
    dims, s = grid[:-1], grid[-1]
    k = len(dims)
    if any(d < 2 for d in dims):
        raise ValueError("gridmf needs every grid axis >= 2")
    ncell = int(np.prod(dims))
    if ncell * s != n:
        raise ValueError(f"grid {grid} does not cover n={n}")
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    dims_arr = np.asarray(dims, dtype=np.int64)
    strides = np.ones(k, dtype=np.int64)
    for a in range(k - 2, -1, -1):
        strides[a] = strides[a + 1] * dims[a + 1]

    ci_cell = rows % ncell
    cj_cell = cols % ncell
    for a in range(k):
        da = ((cj_cell // strides[a]) % dims[a]
              - (ci_cell // strides[a]) % dims[a])
        if len(da) and np.max(np.abs(da)) > 1:
            raise ValueError("entry pattern is not cell-local "
                             "(stencil reach > 1 or periodic wrap)")

    # ---- perfectly-splittable virtual grid + shapes per depth -------------
    # Each axis padded to P = 2^a*(l+1)-1 so every bisection is exact
    # (h = 2m+1 -> both children exactly m): all nodes at a depth are
    # congruent and every ghost cell lies beyond the real high edge,
    # where it can never coincide with a real cell of another node.
    t = max(2, int(round(leaf_cells ** (1.0 / k))))
    pads = [_pad_axis(d, t) for d in dims]
    cur = [p for p, _ in pads]
    leaf_len = [l for _, l in pads]
    shapes = []
    while (int(np.prod(cur)) > leaf_cells
           and any(cur[a] > leaf_len[a] for a in range(k))):
        cand = [a for a in range(k) if cur[a] > leaf_len[a]]
        axis = min(cand, key=lambda a: (-cur[a], a))
        m = cur[axis] // 2
        shapes.append((tuple(cur), axis, m, False))
        cur[axis] = m
    shapes.append((tuple(cur), 0, 0, True))
    D = len(shapes) - 1   # leaf depth

    # ---- per-node origins (children interleaved as 2i, 2i+1) --------------
    origins = [np.zeros((1, k), dtype=np.int64)]
    for d in range(D):
        _shape, axis, m, _ = shapes[d]
        org = origins[d]
        o_hi = org.copy()
        o_hi[:, axis] += m + 1
        origins.append(np.stack([org, o_hi], axis=1).reshape(-1, k))

    # ---- per-depth union-trimmed layouts + cell painting -------------------
    depth_of = np.full(ncell, -1, dtype=np.int64)
    node_of = np.full(ncell, -1, dtype=np.int64)
    levels: List[_Level] = []
    luts: List[np.ndarray] = []
    soffs: List[np.ndarray] = []
    for d in range(D + 1):
        shape, axis, m, leaf = shapes[d]
        org = origins[d]
        # union trim: offset o admissible on axis a iff org_a + o_a lands
        # in the real grid for SOME node (origins form a per-axis product,
        # so the any-node test factorizes per axis)
        adm = []
        for a in range(k):
            o = np.arange(-1, shape[a] + 1)
            u = np.unique(org[:, a])
            ok = ((u[None, :] + o[:, None] >= 0)
                  & (u[None, :] + o[:, None] < dims_arr[a])).any(axis=1)
            adm.append(ok)

        def _keep(off):
            kp = np.ones(len(off), dtype=bool)
            for a in range(k):
                kp &= adm[a][off[:, a] + 1]
            return off[kp]

        eoff = _keep(_elim_offsets(shape, axis, m, leaf))
        if len(eoff) == 0:
            # pathological padding: an all-ghost separator — keep one
            # slot so the pivot block is non-empty (unit pivot, det 0)
            eoff = _elim_offsets(shape, axis, m, leaf)[:1]
        soff = _keep(_shell_offsets(shape))
        lut = np.full(tuple(dd + 2 for dd in shape), -1, dtype=np.int64)
        lut[tuple((eoff + 1).T)] = np.arange(len(eoff))
        lut[tuple((soff + 1).T)] = len(eoff) + np.arange(len(soff))
        luts.append(lut)
        soffs.append(soff)

        lv = _Level(n_nodes=len(org),
                    ncell_front=len(eoff) + len(soff),
                    ncell_elim=len(eoff), s=s)
        levels.append(lv)
        g = org[:, None, :] + eoff[None, :, :]         # (n_nodes, ne, k)
        realmask = np.all(g < dims_arr[None, None, :], axis=2)
        flatcell = (g * strides[None, None, :]).sum(axis=2)
        rr = flatcell[realmask]
        assert np.all(depth_of[rr] == -1), "cell painted twice"
        depth_of[rr] = d
        node_of[rr] = np.broadcast_to(
            np.arange(len(org))[:, None], flatcell.shape)[realmask]
        # elim var ids (ghost -> n pad), species-major layout
        evar = (flatcell[:, :, None]
                + np.arange(s)[None, None, :] * ncell)
        evar = np.where(realmask[:, :, None], evar, n)
        lv.elim_var = evar.reshape(len(org), -1).astype(np.int32)
        # ghost diagonal positions (per VAR)
        gmask = ~realmask
        if gmask.any():
            nidx, eidx = np.nonzero(gmask)
            F = lv.F
            base = (nidx[:, None] * F + (eidx[:, None] * s
                                         + np.arange(s)[None, :]))
            lv.ghost_diag = (base * F + (eidx[:, None] * s
                                         + np.arange(s)[None, :])
                             ).reshape(-1).astype(np.int64)
        else:
            lv.ghost_diag = np.zeros(0, dtype=np.int64)
    assert np.all(depth_of >= 0)

    # ---- child->parent embedding maps (per depth, per side) --------------
    for d in range(1, D + 1):
        _pshape, p_axis, p_m, _p_leaf = shapes[d - 1]
        soff = soffs[d]
        plut = luts[d - 1]
        emb = np.empty((2, len(soff) * s), dtype=np.int64)
        for side in (0, 1):
            poff = soff.copy()
            poff[:, p_axis] += (p_m + 1) * side
            cpos = plut[tuple((poff + 1).T)]
            vpos = np.where(cpos[:, None] >= 0,
                            cpos[:, None] * s + np.arange(s)[None, :], -1)
            emb[side] = vpos.reshape(-1)
        levels[d].emb = emb

    # ---- entry assembly ---------------------------------------------------
    ki = rows // ncell
    kj = cols // ncell
    di = depth_of[ci_cell]
    dj = depth_of[cj_cell]
    dh = np.maximum(di, dj)           # deeper endpoint = home depth
    home_cell = np.where(di >= dj, ci_cell, cj_cell)
    nid = node_of[home_cell]

    def pos_in_home(cell, kk):
        pos = np.empty(len(rows), dtype=np.int64)
        coords = np.stack([(cell // strides[a]) % dims[a]
                           for a in range(k)], axis=1)
        for d in range(D + 1):
            sel = dh == d
            if not sel.any():
                continue
            off = coords[sel] - origins[d][nid[sel]]
            p = luts[d][tuple((off + 1).T)]
            assert np.all(p >= 0), "entry endpoint outside home front"
            pos[sel] = p * s + kk[sel]
        return pos

    pi = pos_in_home(ci_cell, ki)
    pj = pos_in_home(cj_cell, kj)
    # flat position within the depth's (n_nodes, F, F) front array
    Fs = np.array([lv.F for lv in levels], dtype=np.int64)
    flat = (nid * Fs[dh] + pi) * Fs[dh] + pj
    key = dh * (np.max(flat) + 2) + flat  # order by depth, then position
    order = np.argsort(key, kind="stable")
    uk, seg = np.unique(key[order], return_inverse=True)
    plan = GridMfPlan(n=n, dims=dims, s=s, levels=levels,
                      entry_perm=order.astype(np.int64),
                      entry_seg=seg.astype(np.int64), n_uniq=len(uk),
                      pivot_epsilon=pivot_epsilon)
    # per-depth unique positions + value slices
    ud = uk // (np.max(flat) + 2)
    uflat = uk % (np.max(flat) + 2)
    for d in range(D + 1):
        sel = ud == d
        levels[d].asm_idx = uflat[sel].astype(np.int64)
        levels[d].asm_off = int(np.searchsorted(ud, d, side="left"))
        levels[d].asm_len = int(sel.sum())
    return plan


# ---------------------------------------------------------------------------
# device numeric phase
# ---------------------------------------------------------------------------


def _mk_P(params):
    """Index-array accessor: embedded constants (params=None) or traced
    ARGUMENTS from gridmf_whole_params() — embedding every index vector
    as a literal pushes the one-graph program past what the remote
    server compiler accepts at ~10^5-10^6 rows (entry permutation alone
    is ~50 MB at 79^3: observed as a silent >1 h compile / 'response
    body closed'). Same size-gated pattern as genmf._mk_P."""
    if params is None:
        return lambda key, build: jnp.asarray(_idx32(build()))

    def P(key, build):
        v = params.get(key)
        return jnp.asarray(_idx32(build())) if v is None else v
    return P


def _presum(plan: GridMfPlan, data, params=None):
    """One gather + one sorted segment-sum: duplicate entries (and
    symmetric-storage expansions) collapse onto their unique front
    positions."""
    P = _mk_P(params)
    d = data[P("eperm", lambda: plan.entry_perm)]
    return jax.ops.segment_sum(d, P("eseg", lambda: plan.entry_seg),
                               num_segments=plan.n_uniq,
                               indices_are_sorted=True)


def _assemble(lv: _Level, uniq, dtype, ghost=True, params=None, di=None):
    P = _mk_P(params)
    F = lv.F
    flat = jnp.zeros(lv.n_nodes * F * F, dtype=dtype)
    if ghost and len(lv.ghost_diag):
        # ghost pivot slots get a REAL unit diagonal (imag plane stays
        # zero), so each contributes exactly 0 to log|det|
        flat = flat.at[P(f"gd{di}", lambda: lv.ghost_diag)].add(1.0)
    if lv.asm_len:
        vals = jax.lax.dynamic_slice(uniq, (lv.asm_off,), (lv.asm_len,))
        flat = flat.at[P(f"asm{di}", lambda: lv.asm_idx)].add(
            vals.astype(dtype))
    return flat.reshape(lv.n_nodes, F, F)


def gridmf_whole_params(plan: GridMfPlan, min_elems: int = 65536) -> dict:
    """Host pytree of the LARGE index arrays the jitted factorize/solve
    graphs take as ARGUMENTS (see _mk_P); smaller vectors stay jaxpr
    constants (constant-index gathers compile to faster device code)."""
    out = {}

    def put(key, arr):
        if arr is not None and np.asarray(arr).size >= min_elems:
            out[key] = np.asarray(arr)

    put("eperm", plan.entry_perm)
    put("eseg", plan.entry_seg)
    for di, lv in enumerate(plan.levels):
        put(f"gd{di}", lv.ghost_diag)
        put(f"asm{di}", lv.asm_idx)
        put(f"ev{di}", lv.elim_var)
    return out


def _inv_embed(parent_F: int, child: _Level, side: int, pad: int):
    """inv[parent front pos] = child keep pos (or ``pad`` = zero slot)."""
    inv = np.full(parent_F, pad, dtype=np.int64)
    m = child.emb[side]
    src = np.nonzero(m >= 0)[0]
    inv[m[m >= 0]] = src
    return inv


def _embed_mat(parent: _Level, child: _Level, schur_re, schur_im):
    """Extend-add both children's Schur complements into zero-initialised
    parent fronts: T[n, a, b] = Sch[n, side, inv[a], inv[b]] as two takes
    with CONSTANT index vectors (ghost overflow positions read a zero pad
    slot)."""
    r = schur_re.shape[-1]
    outs = []
    for S in (schur_re, schur_im):
        if S is None:
            outs.append(None)
            continue
        n2 = S.shape[0] // 2
        Sp = S.reshape(n2, 2, r, r)
        acc = 0
        for side in (0, 1):
            inv = jnp.asarray(_idx32(_inv_embed(parent.F, child,
                                                 side, r)))
            Spad = jnp.pad(Sp[:, side], ((0, 0), (0, 1), (0, 1)))
            acc = acc + Spad[:, inv][:, :, inv]
        outs.append(acc)
    return outs


def _embed_vec(parent: _Level, child: _Level, fk_re, fk_im):
    r = fk_re.shape[-1]
    outs = []
    for v in (fk_re, fk_im):
        if v is None:
            outs.append(None)
            continue
        n2 = v.shape[0] // 2
        vp = v.reshape(n2, 2, r)
        acc = 0
        for side in (0, 1):
            inv = jnp.asarray(_idx32(_inv_embed(parent.F, child,
                                                 side, r)))
            vpad = jnp.pad(vp[:, side], ((0, 0), (0, 1)))
            acc = acc + vpad[:, inv]
        outs.append(acc)
    return outs


def _restrict_vec(lv: _Level, xf_re, xf_im):
    """Down-sweep: child keep values from the parent's front solution."""
    outs = []
    for xf in (xf_re, xf_im):
        if xf is None:
            outs.append(None)
            continue
        parts = []
        for side in (0, 1):
            m = lv.emb[side].copy()
            m[m < 0] = xf.shape[-1]                    # ghost -> zero pad
            xpad = jnp.pad(xf, ((0, 0), (0, 1)))
            parts.append(xpad[:, jnp.asarray(_idx32(m))])
        outs.append(jnp.stack(parts, axis=1).reshape(-1, lv.emb.shape[1]))
    return outs


def _mm(Ar, Ai, Br, Bi):
    """Planes matmul (3-mult Karatsuba for complex x complex)."""
    if Ai is None and Bi is None:
        return Ar @ Br, None
    if Ai is None:
        return Ar @ Br, Ar @ Bi
    if Bi is None:
        return Ar @ Br, Ai @ Br
    P1 = Ar @ Br
    P2 = Ai @ Bi
    P3 = (Ar + Ai) @ (Br + Bi)
    return P1 - P2, P3 - P1 - P2


def _inv_planes(Sr, Si, delta):
    """Planes inverse via the real embedding K=[[R,-I],[I,R]] and
    splu._inv_block (static pivot clamping). For complex inputs the
    K determinant is |det|^2 -> halve log|det|, phase unrecoverable."""
    if Si is None:
        Dinv, ld, mp, npc, ph = _inv_block(Sr, delta)
        return Dinv, None, jnp.sum(ld), jnp.min(mp), jnp.sum(npc), \
            jnp.prod(ph)
    e = Sr.shape[-1]
    top = jnp.concatenate([Sr, -Si], axis=-1)
    bot = jnp.concatenate([Si, Sr], axis=-1)
    K = jnp.concatenate([top, bot], axis=-2)
    Kinv, ld, mp, npc, ph = _inv_block(K, delta)
    return (Kinv[:, :e, :e], Kinv[:, e:, :e], 0.5 * jnp.sum(ld),
            jnp.min(mp), jnp.sum(npc), jnp.ones((), Sr.dtype))


def gridmf_factorize(plan: GridMfPlan, data, shard=None, params=None):
    """Batched multifrontal factorization; jittable for a fixed plan.
    Returns a fac pytree with per-depth {Sinv, Lhat, B} (planes) plus
    logdet/phase/min_pivot/n_perturbed (SPLU-compatible surface).

    ``shard`` (optional): callback applied to every per-level batched
    array (leading axis = congruent tree nodes). parallel.dist_gridmf
    passes a ``with_sharding_constraint`` over the mesh here — the node
    batch is embarrassingly parallel and children 2i, 2i+1 stay on the
    parent's shard under blockwise sharding, so the extend-add needs no
    cross-device traffic until n_nodes < n_devices."""
    if shard is None:
        shard = lambda a: a
    data = jnp.asarray(data)
    cplx = jnp.iscomplexobj(data)
    rdt = jnp.real(data).dtype
    if cplx:
        uniq_re = _presum(plan, jnp.real(data), params)
        uniq_im = _presum(plan, jnp.imag(data), params)
    else:
        uniq_re = _presum(plan, data, params)
        uniq_im = None
    delta = (plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data)))).astype(rdt)

    store = [None] * len(plan.levels)
    sch_re = sch_im = None
    ld = jnp.zeros((), rdt)
    mp = jnp.asarray(jnp.inf, rdt)
    npc = jnp.zeros((), jnp.int32)
    ph = jnp.ones((), rdt)
    for d in range(len(plan.levels) - 1, -1, -1):
        lv = plan.levels[d]
        fr = shard(_assemble(lv, uniq_re, rdt, params=params, di=d))
        fi = shard(_assemble(lv, uniq_im, rdt, ghost=False,
                             params=params, di=d)) if cplx else None
        if sch_re is not None:
            tr, ti = _embed_mat(lv, plan.levels[d + 1], sch_re, sch_im)
            fr = fr + shard(tr)
            if cplx:
                fi = fi + shard(ti)
        e = lv.e
        Sr, Si = fr[:, :e, :e], (fi[:, :e, :e] if cplx else None)
        Br, Bi = fr[:, :e, e:], (fi[:, :e, e:] if cplx else None)
        Cr, Ci = fr[:, e:, :e], (fi[:, e:, :e] if cplx else None)
        Rr, Ri = fr[:, e:, e:], (fi[:, e:, e:] if cplx else None)
        SIr, SIi, ld_d, mp_d, np_d, ph_d = _inv_planes(Sr, Si, delta)
        SIr = shard(SIr)
        SIi = shard(SIi) if SIi is not None else None
        Lr, Li = _mm(Cr, Ci, SIr, SIi)
        Ur, Ui = _mm(Lr, Li, Br, Bi)
        sch_re = shard(Rr - Ur)
        sch_im = shard(Ri - Ui) if cplx else None
        store[d] = {"sir": SIr, "sii": SIi, "lr": Lr, "li": Li,
                    "br": Br, "bi": Bi}
        ld = ld + ld_d
        mp = jnp.minimum(mp, mp_d)
        npc = npc + np_d
        ph = ph * ph_d.astype(rdt) if not cplx else ph
    return {"levels": store, "logdet": ld, "phase": ph, "min_pivot": mp,
            "n_perturbed": npc}


def gridmf_flops(plan: GridMfPlan) -> int:
    """Real-plane factorization flop count from the static schedule
    (pivot-block inverse ~2e^3 + panel 2re^2 + Schur 2r^2e per front) —
    lets artifacts report achieved GFLOP/s against chip peak."""
    return int(sum(lv.n_nodes * (2 * lv.e ** 3 + 2 * lv.r * lv.e * lv.e
                                 + 2 * lv.r * lv.r * lv.e)
                   for lv in plan.levels))


def gridmf_store_gb(plan: GridMfPlan, bytes_per: int = 4) -> float:
    """Factor storage per value plane ({Sinv, Lhat, B} per level)."""
    return bytes_per * sum(lv.n_nodes * (lv.e * lv.e + 2 * lv.r * lv.e)
                           for lv in plan.levels) / 2 ** 30


def _ooc_depth_chunked(plan, d, uniq_re, sch_re, delta, rdt, ch_gb,
                       steps):
    """One OOC tree depth whose full front batch exceeds the HBM chunk
    budget: assemble + extend-add + factor per NODE CHUNK, child Schur
    on host. Per-chunk assembly indices ship as padded ARGUMENTS so one
    compiled program covers every full-size chunk (the remainder chunk
    compiles once more). Numerics identical to the whole-depth path
    (same ops per node, same order)."""
    lv = plan.levels[d]
    F = lv.F
    e = lv.e
    itm = np.dtype(rdt).itemsize
    c_nodes = max(1, int((ch_gb * 2 ** 30) // (F * F * itm)))
    c_nodes = min(c_nodes, lv.n_nodes)

    # host-side per-depth assembly prep, cached on the plan
    prep = _plan_cache(plan, "ooc_chunk_prep").get(d)
    if prep is None:
        asm = np.asarray(lv.asm_idx, np.int64)
        order = np.argsort(asm, kind="stable")
        asm_sorted = asm[order]
        gd = np.sort(np.asarray(lv.ghost_diag, np.int64)) if len(
            lv.ghost_diag) else np.zeros(0, np.int64)
        prep = (asm_sorted, order.astype(np.int64), gd)
        _plan_cache(plan, "ooc_chunk_prep")[d] = prep
    asm_sorted, order, gd = prep

    # per-chunk index slices (host)
    bounds = list(range(0, lv.n_nodes, c_nodes))
    chunks = []
    for a in bounds:
        b = min(a + c_nodes, lv.n_nodes)
        lo, hi = np.searchsorted(asm_sorted,
                                 [a * F * F, b * F * F])
        glo, ghi = np.searchsorted(gd, [a * F * F, b * F * F])
        chunks.append((a, b, lo, hi, glo, ghi))
    Lmax = max(hi - lo for _, _, lo, hi, _, _ in chunks)
    Gmax = max(ghi - glo for *_, glo, ghi in chunks)

    # jitted fronts program per (depth, chunk node count, index widths)
    def make_fronts(nn, Ln, Gn):
        child = plan.levels[d + 1] if d + 1 < len(plan.levels) else None

        def body(uniq, gidx, idx_local, gd_local, sch_chunk):
            flat = jnp.zeros(nn * F * F, dtype=rdt)
            if Gn:
                flat = flat.at[gd_local].add(1.0, mode="drop")
            if Ln:
                vals = uniq[gidx]
                flat = flat.at[idx_local].add(vals.astype(rdt),
                                              mode="drop")
            fr = flat.reshape(nn, F, F)
            if sch_chunk is not None and child is not None:
                r = sch_chunk.shape[-1]
                Sp = sch_chunk.reshape(nn, 2, r, r)
                for side in (0, 1):
                    m = child.emb[side].copy()
                    m[m < 0] = F
                    mj = jnp.asarray(_idx32(m))
                    fr = fr.at[:, mj[:, None], mj[None, :]].add(
                        Sp[:, side], mode="drop")
            return fr
        return jax.jit(body)

    parts_sir, parts_lr, parts_br, parts_sch = [], [], [], []
    ld_d = 0.0
    mp_d = np.inf
    np_d = 0
    ph_d = 1.0
    have_sch = sch_re is not None
    sch_host = (np.asarray(jax.device_get(sch_re))
                if have_sch and not isinstance(sch_re, np.ndarray)
                else sch_re)
    del sch_re
    step_factor = steps[d][1]
    for (a, b, lo, hi, glo, ghi) in chunks:
        nn = b - a
        # pad index args to the per-depth max so full chunks share one
        # program (padded scatter slots point OOB -> mode="drop")
        Ln = Lmax if nn == c_nodes else (hi - lo)
        Gn = Gmax if nn == c_nodes else (ghi - glo)
        idx_local = np.full(Ln, nn * F * F, np.int64)
        idx_local[:hi - lo] = asm_sorted[lo:hi] - a * F * F
        gidx = np.zeros(Ln, np.int64)
        gidx[:hi - lo] = lv.asm_off + order[lo:hi]
        gd_local = np.full(Gn, nn * F * F, np.int64)
        gd_local[:ghi - glo] = gd[glo:ghi] - a * F * F
        key = ("cfr", d, nn, Ln, Gn)
        cf = steps.get(key)
        if cf is None:
            cf = steps[key] = make_fronts(nn, Ln, Gn)
        schc = (jnp.asarray(sch_host[2 * a:2 * b]) if have_sch
                else None)
        fr_c = cf(uniq_re, jnp.asarray(_idx32(gidx)),
                  jnp.asarray(_idx32(idx_local)),
                  jnp.asarray(_idx32(gd_local)), schc)
        del schc
        SIr, Lr, Br, sch_c, ldc, mpc, npcc, phc = step_factor(fr_c,
                                                              delta)
        del fr_c
        parts_sir.append(jax.device_get(SIr))
        parts_lr.append(jax.device_get(Lr))
        parts_br.append(jax.device_get(Br))
        parts_sch.append(jax.device_get(sch_c))
        del SIr, Lr, Br, sch_c
        ld_d += float(ldc)
        mp_d = min(mp_d, float(mpc))
        np_d += int(npcc)
        ph_d *= float(phc)
    del sch_host
    store_d = {"sir": np.concatenate(parts_sir), "sii": None,
               "lr": np.concatenate(parts_lr), "li": None,
               "br": np.concatenate(parts_br), "bi": None}
    sch_out = (parts_sch[0] if len(parts_sch) == 1
               else np.concatenate(parts_sch, axis=0))
    return store_d, sch_out, ld_d, mp_d, np_d, ph_d


def gridmf_factorize_ooc(plan: GridMfPlan, data):
    """Out-of-core factorization: factors stream to HOST RAM.

    The TPU analog of cuDSS hybrid host/device memory mode
    (reference: russell_sparse/c_code/interface_cudss.cu:351) and the
    MUMPS ICNTL(14)/(23) workspace controls (interface_mumps.c:149-152):
    when the multifrontal factor store exceeds HBM (3-D operators obey
    the O(n^{4/3}) fill law — 19.7 GB/plane at 101^3), the in-core path
    simply OOMs. Here the per-depth pipeline runs EAGERLY (no outer jit,
    so no device_get-in-trace problem and no minutes-long whole-program
    compile), and each depth's factors {Sinv, Lhat, B} are fetched to
    host numpy as soon as they are produced; peak HBM = one depth's
    fronts + the running Schur complement (~the two largest adjacent
    levels). Eager dispatch also bounds every device call well under the
    worker watchdog. The returned fac is numerically IDENTICAL to
    gridmf_factorize's (same ops, same order) with numpy level stores —
    gridmf_solve accepts it directly (jnp re-ships each level on use).

    Each depth runs as its OWN cached jitted step (compiled once per
    (plan, depth); the Schur carry is donated) — on the remote-tunnel
    backend, fully eager op-by-op dispatch would pay a per-op round
    trip, while one whole-factorization jit could not device_get the
    finished depths out.

    ``data`` must be REAL (the complex-pair use lives in the fused ODE
    path, which never runs out-of-core; complex host transfers are also
    unimplemented on the attached backend)."""
    data_np = np.asarray(data)
    if np.iscomplexobj(data_np):
        raise NotImplementedError(
            "out-of-core gridmf is real-only (ship complex as planes "
            "through the in-core path)")
    dev = jnp.asarray(data_np)
    rdt = dev.dtype
    uniq_re = _presum(plan, dev)
    delta = jnp.asarray(plan.pivot_epsilon * (1.0 + float(
        np.max(np.abs(data_np)))), rdt)

    steps = _plan_cache(plan, "ooc_fact").setdefault(str(rdt), {})
    store: List[Optional[dict]] = [None] * len(plan.levels)
    sch_re = None
    ld = 0.0
    mp = np.inf
    npc = 0
    ph = 1.0
    D = len(plan.levels) - 1
    for d in range(D, -1, -1):
        step = steps.get(d)
        if step is None:
            def make(d):
                lv = plan.levels[d]

                # TWO jits per depth, not one: the previous Schur must
                # be FREED before the inversion intermediates peak
                # (measured: the monolithic step RESOURCE_EXHAUSTs at
                # 79^3, whose biggest level carries 3.7 GB of fronts).
                # The extend-add SCATTERS the child Schur into the
                # fronts (r^2-sized updates) instead of the in-core
                # path's gather embedding, whose two full-front-sized
                # intermediates per side (~3x fronts) also exhaust HBM
                # at 79^3. Scatter is slower per element — acceptable
                # on the streaming path, fatal to peak memory nowhere.
                def fronts(uniq, sch):
                    fr = _assemble(lv, uniq, rdt)
                    if sch is not None:
                        child = plan.levels[d + 1]
                        r = sch.shape[-1]
                        Sp = sch.reshape(lv.n_nodes, 2, r, r)
                        for side in (0, 1):
                            m = child.emb[side].copy()
                            m[m < 0] = lv.F          # OOB -> dropped
                            mj = jnp.asarray(m)
                            fr = fr.at[:, mj[:, None], mj[None, :]].add(
                                Sp[:, side], mode="drop")
                    return fr

                def factor(fr, delta):
                    e = lv.e
                    SIr, _, ld_d, mp_d, np_d, ph_d = _inv_planes(
                        fr[:, :e, :e], None, delta)
                    Br = fr[:, :e, e:]
                    Lr, _ = _mm(fr[:, e:, :e], None, SIr, None)
                    Ur, _ = _mm(Lr, None, Br, None)
                    new_sch = fr[:, e:, e:] - Ur
                    return SIr, Lr, Br, new_sch, ld_d, mp_d, np_d, ph_d

                return (jax.jit(fronts), jax.jit(factor))
            step = steps[d] = make(d)
        lv = plan.levels[d]
        F = lv.F
        import os as _os
        ch_gb = float(_os.environ.get("RUSSELL_TPU_GRIDMF_CHUNK_GB",
                                      "2.0"))
        fr_bytes_full = lv.n_nodes * F * F * np.dtype(rdt).itemsize
        if fr_bytes_full > ch_gb * 2 ** 30:
            # whole-depth fronts would not even FIT in HBM (measured
            # RESOURCE_EXHAUSTED right at assemble on 120^3, whose worst
            # depth is 16 GB of fronts): assemble AND factor per node
            # chunk, with the child Schur held on HOST and shipped per
            # chunk. Per-chunk assembly scatter/gather indices ride as
            # ARGUMENTS (padded to a per-depth max so one program covers
            # all full chunks).
            out = _ooc_depth_chunked(plan, d, uniq_re, sch_re, delta,
                                     rdt, ch_gb, steps)
            store[d], sch_re, ld_d, mp_d, np_d, ph_d = out
            ld += ld_d
            mp = min(mp, mp_d)
            npc += np_d
            ph *= ph_d
            continue
        if isinstance(sch_re, np.ndarray):
            sch_re = jnp.asarray(sch_re)
        fr = step[0](uniq_re, sch_re)
        jax.block_until_ready(fr)
        del sch_re                       # free the child Schur NOW
        # chunk the node batch: at 79^3 the biggest level's fronts are
        # 3.7 GB and the factor step's outputs + recursive-Schur inverse
        # intermediates on the WHOLE batch exceed HBM even with the
        # fronts/factor split (measured RESOURCE_EXHAUSTED); chunks keep
        # the working set ~fr + fr/nch. Chunk boundaries stay
        # even-aligned so the 2i/2i+1 child pairing of the next depth's
        # extend-add is preserved when the Schur chunks re-concatenate.
        fr_bytes = fr.size * fr.dtype.itemsize
        nch = max(1, int(np.ceil(fr_bytes / (1.5 * 2 ** 30))))
        chunk = max(2, 2 * int(np.ceil(lv.n_nodes / (2 * nch))))
        parts_sir, parts_lr, parts_br, parts_sch = [], [], [], []
        ld_d = 0.0
        mp_d = np.inf
        np_d = 0
        ph_d = 1.0
        for a in range(0, lv.n_nodes, chunk):
            frc = fr[a:a + chunk]
            SIr, Lr, Br, sch_c, ldc, mpc, npcc, phc = step[1](frc, delta)
            del frc
            parts_sir.append(jax.device_get(SIr))
            parts_lr.append(jax.device_get(Lr))
            parts_br.append(jax.device_get(Br))
            parts_sch.append(sch_c)
            ld_d += float(ldc)
            mp_d = min(mp_d, float(mpc))
            np_d += int(npcc)
            ph_d *= float(phc)
            del SIr, Lr, Br
        del fr
        store[d] = {"sir": np.concatenate(parts_sir), "sii": None,
                    "lr": np.concatenate(parts_lr), "li": None,
                    "br": np.concatenate(parts_br), "bi": None}
        del parts_sir, parts_lr, parts_br
        ld += ld_d
        mp = min(mp, mp_d)
        npc += np_d
        ph *= ph_d
        sch_re = (parts_sch[0] if len(parts_sch) == 1
                  else jnp.concatenate(parts_sch, axis=0))
        del parts_sch
    return {"levels": store, "logdet": jnp.asarray(ld, rdt),
            "phase": jnp.asarray(ph, rdt),
            "min_pivot": jnp.asarray(mp, rdt),
            "n_perturbed": jnp.asarray(npc, jnp.int32)}


# cached per-(plan, depth) jitted steps for the out-of-core paths —
# attached to the plan object (an id(plan)-keyed module dict poisons a
# NEW plan when the garbage collector recycles the id)


def _plan_cache(plan, name: str) -> dict:
    st = getattr(plan, "_" + name, None)
    if st is None:
        st = {}
        setattr(plan, "_" + name, st)
    return st


def gridmf_solve_ooc(plan: GridMfPlan, fac, bvec):
    """Solve with HOST-resident factors: per-depth jitted steps re-ship
    each level's {Sinv, Lhat, B} on use (the streaming counterpart of
    gridmf_solve; numerics identical). Real-only, like the OOC
    factorization."""
    rdt = fac["levels"][-1]["sir"].dtype
    bp = jnp.concatenate([jnp.asarray(bvec).astype(rdt),
                          jnp.zeros(1, rdt)])
    steps = _plan_cache(plan, "ooc_solve").setdefault(str(rdt), {})
    D = len(plan.levels) - 1

    fe_st: List[Optional[jnp.ndarray]] = [None] * (D + 1)
    fk = None
    for d in range(D, -1, -1):
        key = ("up", d)
        step = steps.get(key)
        if step is None:
            def make_up(d):
                lv = plan.levels[d]

                def body(bp, fk, lr):
                    fr = jnp.zeros((lv.n_nodes, lv.F), rdt)
                    if fk is not None:
                        tr, _ = _embed_vec(lv, plan.levels[d + 1], fk,
                                           None)
                        fr = fr + tr
                    e = lv.e
                    fr = fr.at[:, :e].add(bp[jnp.asarray(_idx32(
                        lv.elim_var))])
                    fer = fr[:, :e]
                    ur, _ = _mm(lr, None, fer[:, :, None], None)
                    return fer, fr[:, e:] - ur[:, :, 0]

                return jax.jit(body)
            step = steps[key] = make_up(d)
        fer, fk = step(bp, fk, fac["levels"][d]["lr"])
        fe_st[d] = fer

    x = jnp.zeros(plan.n + 1, rdt)
    xk = None
    xf = None
    for d in range(0, D + 1):
        key = ("down", d)
        step = steps.get(key)
        if step is None:
            def make_down(d):
                lv = plan.levels[d]

                def body(x, fer, xf, sir, br):
                    if d == 0:
                        xk = jnp.zeros((1, lv.r), rdt)
                    else:
                        xk, _ = _restrict_vec(lv, xf, None)
                    br_, _ = _mm(br, None, xk[:, :, None], None)
                    rr = fer - br_[:, :, 0]
                    xer, _ = _mm(sir, None, rr[:, :, None], None)
                    xer = xer[:, :, 0]
                    ev = jnp.asarray(_idx32(lv.elim_var))
                    x = x.at[ev.reshape(-1)].set(xer.reshape(-1),
                                                 mode="drop")
                    return x, jnp.concatenate([xer, xk], axis=1)

                return jax.jit(body, donate_argnums=(0,))
            step = steps[key] = make_down(d)
        x, xf = step(x, fe_st[d], xf, fac["levels"][d]["sir"],
                     fac["levels"][d]["br"])
    return x[:plan.n]


def gridmf_solve(plan: GridMfPlan, fac, bvec, shard=None, params=None):
    """x = A^{-1} b through the stored fronts: up-sweep (forward
    elimination of the rhs) then down-sweep (back-substitution), all
    batched einsums. Jittable. ``shard``/``params``: see
    gridmf_factorize."""
    if shard is None:
        shard = lambda a: a
    P = _mk_P(params)
    # complexness is part of the pytree STRUCTURE (None leaves), so the
    # fac stays usable across jit boundaries (no traced-bool branching)
    cplx = fac["levels"][-1]["sii"] is not None
    rdt = jnp.asarray(fac["levels"][-1]["sir"]).dtype
    if isinstance(bvec, tuple):
        # (re, im) PLANES: the out-of-core path ships complex rhs as
        # planes (complex host<->device transfers are unimplemented on
        # the attached backend)
        b_re, b_im = (jnp.asarray(v) for v in bvec)
    else:
        bvec = jnp.asarray(bvec)
        b_re = jnp.real(bvec)
        b_im = jnp.imag(bvec) if cplx else None
    if cplx:
        bp_re = jnp.concatenate([b_re.astype(rdt), jnp.zeros(1, rdt)])
        bp_im = jnp.concatenate([
            (b_im if b_im is not None else jnp.zeros_like(b_re)
             ).astype(rdt), jnp.zeros(1, rdt)])
    else:
        bp_re = jnp.concatenate([b_re.astype(rdt), jnp.zeros(1, rdt)])
        bp_im = None

    D = len(plan.levels) - 1
    fe_st = [None] * (D + 1)
    fk_re = fk_im = None
    for d in range(D, -1, -1):
        lv = plan.levels[d]
        st = fac["levels"][d]
        e = lv.e
        fr = jnp.zeros((lv.n_nodes, lv.F), rdt)
        fi = jnp.zeros((lv.n_nodes, lv.F), rdt) if cplx else None
        if fk_re is not None:
            tr, ti = _embed_vec(lv, plan.levels[d + 1], fk_re, fk_im)
            fr = fr + tr
            if cplx:
                fi = fi + ti
        ev = P(f"ev{d}", lambda: lv.elim_var)
        fr = fr.at[:, :e].add(bp_re[ev])
        if cplx:
            fi = fi.at[:, :e].add(bp_im[ev])
        fer, fei = fr[:, :e], (fi[:, :e] if cplx else None)
        fe_st[d] = (fer, fei)
        # keep-rhs update: fk - Lhat @ fe
        ur, ui = _mm(st["lr"], st["li"],
                     fer[:, :, None], fei[:, :, None] if cplx else None)
        fk_re = shard(fr[:, e:] - ur[:, :, 0])
        fk_im = shard(fi[:, e:] - ui[:, :, 0]) if cplx else None

    x_re = jnp.zeros(plan.n + 1, rdt)
    x_im = jnp.zeros(plan.n + 1, rdt) if cplx else None
    xf_re = xf_im = None
    for d in range(0, D + 1):
        lv = plan.levels[d]
        st = fac["levels"][d]
        e = lv.e
        if d == 0:
            xk_re = jnp.zeros((1, lv.r), rdt)
            xk_im = jnp.zeros((1, lv.r), rdt) if cplx else None
        else:
            xk_re, xk_im = _restrict_vec(lv, xf_re, xf_im)
        fer, fei = fe_st[d]
        br_, bi_ = _mm(st["br"], st["bi"],
                       xk_re[:, :, None], xk_im[:, :, None] if cplx
                       else None)
        rr = fer - br_[:, :, 0]
        ri = (fei - bi_[:, :, 0]) if cplx else None
        xer, xei = _mm(st["sir"], st["sii"],
                       rr[:, :, None], ri[:, :, None] if cplx else None)
        xer = xer[:, :, 0]
        xei = xei[:, :, 0] if cplx else None
        ev = jnp.asarray(_idx32(lv.elim_var))
        x_re = x_re.at[ev.reshape(-1)].set(xer.reshape(-1), mode="drop")
        if cplx:
            x_im = x_im.at[ev.reshape(-1)].set(xei.reshape(-1),
                                               mode="drop")
        xf_re = shard(jnp.concatenate([xer, xk_re], axis=1))
        xf_im = (shard(jnp.concatenate([xei, xk_im], axis=1)) if cplx
                 else None)
    if cplx:
        cdt = jnp.complex64 if rdt == jnp.float32 else jnp.complex128
        return (x_re[:plan.n].astype(cdt)
                + 1j * x_im[:plan.n].astype(cdt))
    return x_re[:plan.n]
