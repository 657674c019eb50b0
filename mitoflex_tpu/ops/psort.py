"""Pallas bitonic sort + run MERGE for multiword keys on TPU.

XLA's `lax.sort` is the k-mer counting wall (PLAN.md: 461 Mkeys/s for the
bare 2-word sort = 87% of count_chunk_runs). This module implements the
TPU-native alternative measured out in round 1:

- **intra-tile bitonic sort** (`_sort_tile_kernel`): each grid cell sorts
  a T-element tile entirely in VMEM — the log2(T)*(log2(T)+1)/2
  compare-exchange stages cost zero HBM traffic. Butterfly partners
  (i ^ s) are fetched with static leading-axis reshapes for sublane
  strides (s >= 128) and lane rolls + selects for lane strides (s < 128)
  — no gathers, which TPU lacks.
- **cross-tile butterflies** in plain XLA: for strides >= T the partner
  tile is aligned elementwise, so the exchange is a full-width row
  operation on a [tiles, T] view — the one bitonic pattern XLA lowers
  well (the strided intra-row form measured 27x off the HBM bound).
- **intra-tile finish passes** (`_finish_tile_kernel`): after each
  cross-tile stage the remaining strides < T run in VMEM again, with the
  tile's global direction derived from its program id.

Keys are (w0, w1) uint32 word pairs compared lexicographically, matching
`jax.lax.sort([w0, w1], num_keys=2)` order (ties between equal keys are
unordered — fine for counting, where equal keys are interchangeable).
Unsigned order is obtained by sign-flipping to int32 at the boundary
(Mosaic compares are signed).

Gate: `count_chunk_runs` uses this path when MITOFLEX_PALLAS_SORT=1 and
the key is exactly 2 words.

MEASURED (v5e, 4M keys, honest device-loop harness): lax.sort2
429 Mkeys/s vs this kernel 110 Mkeys/s. The bitonic network is
compute-bound — ~217 substages x ~25 int32 VPU ops per element dwarf the
HBM savings, and XLA's native sort HLO spends far fewer ops per
compare-exchange. `lax.sort` therefore stays the default FULL sort;
beating it would need register-level multi-element sorting networks per
stage. Kept because it is the only TPU sort we fully control and as a
worked, tested example of the technique.

The economics flip for MERGING two already-sorted runs — the k-mer LSM's
dominant operation (every key rides ~log2(n_chunks) merges, each of
which `lax.sort` re-sorts from scratch at ~log^2 cost). A bitonic MERGE
is only log2(n) compare-exchange substages: one XLA elementwise pass
(run A vs reversed run B — the reverse fuses into the minmax), then one
Pallas pair-pass per stride >= tile (pure streaming, bandwidth-bound),
then ONE Pallas finish pass doing all strides < tile in VMEM.
`merge_sorted_runs` implements this for W key words + payloads; the
gate and the scattered-run format live in ops/kmer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SIGN = jnp.int32(-0x80000000)


def _flip(w: jax.Array) -> jax.Array:
    """uint32 -> sign-flipped int32 with the same total order."""
    return jax.lax.bitcast_convert_type(w, jnp.int32) ^ SIGN


def _unflip(w: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(w ^ SIGN, jnp.uint32)


def _butterfly_rows(x: jax.Array, sr: int) -> jax.Array:
    """Partner values for stride sr ROWS: x[r ^ sr] via a static reshape
    swap (leading-axis reshapes keep the (sublane, lane) layout)."""
    R, L = x.shape
    y = x.reshape(R // (2 * sr), 2, sr, L)
    y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
    return y.reshape(R, L)


def _butterfly_lanes(x: jax.Array, s: int, lane: jax.Array) -> jax.Array:
    """Partner values for stride s < LANES: x[.., l ^ s] via two lane
    rolls + an arithmetic select on bit s of the lane index (int32 masks
    only — see _cmpex)."""
    up = pltpu.roll(x, LANES - s, 1)  # value from lane l + s (mod LANES)
    dn = pltpu.roll(x, s, 1)          # value from lane l - s
    low = ((lane & s) == 0).astype(jnp.int32)
    return dn + low * (up - dn)


def _cmpex(w0, w1, o0, o1, want_small_i):
    """Take the partner iff it is on the wanted side of the order.

    ``want_small_i`` is an int32 0/1 mask and the select is arithmetic
    (w + take*(o-w), exact under wrapping) — Mosaic cannot lower i1
    vector selects/relayouts ("Unsupported target bitwidth for
    truncation"), so no boolean vectors survive past the comparisons."""
    lt0 = (o0 < w0).astype(jnp.int32)
    gt0 = (o0 > w0).astype(jnp.int32)
    eq0 = (o0 == w0).astype(jnp.int32)
    lt1 = (o1 < w1).astype(jnp.int32)
    gt1 = (o1 > w1).astype(jnp.int32)
    o_lt = lt0 | (eq0 & lt1)
    o_gt = gt0 | (eq0 & gt1)
    take = want_small_i * o_lt + (1 - want_small_i) * o_gt
    return w0 + take * (o0 - w0), w1 + take * (o1 - w1)


def _substage(w0, w1, s, want_small, lane):
    if s >= LANES:
        o0 = _butterfly_rows(w0, s // LANES)
        o1 = _butterfly_rows(w1, s // LANES)
    else:
        o0 = _butterfly_lanes(w0, s, lane)
        o1 = _butterfly_lanes(w1, s, lane)
    return _cmpex(w0, w1, o0, o1, want_small)


def _tile_indices(R):
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    return row * LANES + lane, lane


def _sort_tile_kernel(w0_ref, w1_ref, o0_ref, o1_ref, *, tile):
    """Full bitonic sort of one tile. Directions use the GLOBAL element
    index (tile base + local index): the network's later cross-tile
    stages require tiles to alternate ascending/descending by the base's
    bit of each block size. All stages in VMEM."""
    R = tile // LANES
    i, lane = _tile_indices(R)
    ig = i + pl.program_id(0) * tile
    w0, w1 = w0_ref[:], w1_ref[:]
    m = tile.bit_length() - 1
    for kk in range(1, m + 1):
        block = 1 << kk
        asc = ((ig & block) == 0).astype(jnp.int32)
        for j in range(kk - 1, -1, -1):
            s = 1 << j
            is_lower = ((i & s) == 0).astype(jnp.int32)
            want_small = 1 - (is_lower ^ asc)
            w0, w1 = _substage(w0, w1, s, want_small, lane)
    o0_ref[:] = w0
    o1_ref[:] = w1


def _finish_tile_kernel(w0_ref, w1_ref, o0_ref, o1_ref, *, tile, block):
    """Strides < tile of one global bitonic stage `block` (>= 2*tile):
    the direction is constant per tile — derived from the tile's base
    index bit of `block`."""
    R = tile // LANES
    i, lane = _tile_indices(R)
    base = pl.program_id(0) * tile
    asc = ((base & block) == 0).astype(jnp.int32)  # scalar per tile
    w0, w1 = w0_ref[:], w1_ref[:]
    m = tile.bit_length() - 1
    for j in range(m - 1, -1, -1):
        s = 1 << j
        is_lower = ((i & s) == 0).astype(jnp.int32)
        want_small = 1 - (is_lower ^ asc)
        w0, w1 = _substage(w0, w1, s, want_small, lane)
    o0_ref[:] = w0
    o1_ref[:] = w1


def _tile_call(kernel, w0, w1, tile, interpret, **kw):
    N = w0.shape[0]
    grid = (N // tile,)
    R = tile // LANES
    spec = pl.BlockSpec((R, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM)
    out0, out1 = pl.pallas_call(
        functools.partial(kernel, tile=tile, **kw),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(w0.reshape(N // LANES, LANES), w1.reshape(N // LANES, LANES))
    return out0.reshape(N), out1.reshape(N)


def _cross_butterfly(x: jax.Array, tiles: int, tile: int, sr: int) -> jax.Array:
    """Compare-free partner fetch across tiles: x viewed [tiles, tile],
    partner tile = t ^ sr (sr in tiles)."""
    y = x.reshape(tiles // (2 * sr), 2, sr, tile)
    y = jnp.concatenate([y[:, 1:2], y[:, 0:1]], axis=1)
    return y.reshape(tiles * tile)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def bitonic_sort2(
    w0: jax.Array, w1: jax.Array, tile: int = 1 << 14, interpret: bool = False
):
    """Sort (w0, w1) uint32 pairs lexicographically ascending.

    N = len(w0) must be a power of two and a multiple of `tile`
    (callers pad with 0xFFFFFFFF sentinels, which sort last).
    Returns sorted (w0, w1) uint32."""
    N = w0.shape[0]
    assert N & (N - 1) == 0 and N % tile == 0, (N, tile)
    f0, f1 = _flip(w0), _flip(w1)
    f0, f1 = _tile_call(_sort_tile_kernel, f0, f1, tile, interpret)
    tiles = N // tile
    mT = tile.bit_length() - 1
    mN = N.bit_length() - 1
    i_global = None
    for kk in range(mT + 1, mN + 1):
        block = 1 << kk
        # cross-tile strides: elementwise row butterflies in XLA
        for j in range(kk - 1, mT - 1, -1):
            s = 1 << j
            o0 = _cross_butterfly(f0, tiles, tile, s // tile)
            o1 = _cross_butterfly(f1, tiles, tile, s // tile)
            if i_global is None:
                i_global = jnp.arange(N, dtype=jnp.int32)
            asc = ((i_global & block) == 0).astype(jnp.int32)
            is_lower = ((i_global & s) == 0).astype(jnp.int32)
            want_small = 1 - (is_lower ^ asc)
            f0, f1 = _cmpex(f0, f1, o0, o1, want_small)
        # remaining strides < tile: back into VMEM
        f0, f1 = _tile_call(
            _finish_tile_kernel, f0, f1, tile, interpret, block=block
        )
    return _unflip(f0), _unflip(f1)


# ------------------------------------------------------------- sorted-run merge
def _cmpex_list(vals, partners, want_small_i, n_keys):
    """Generalized compare-exchange: take the partner row iff it lies on
    the wanted side of the multiword-key order. ``vals``/``partners`` are
    lists of int32 arrays — the first ``n_keys`` are sign-flipped key
    words (compared lexicographically), the rest are payloads that follow
    their row. Arithmetic selects only (Mosaic cannot lower i1 vector
    selects — see _cmpex)."""
    lt = jnp.zeros_like(vals[0])
    gt = jnp.zeros_like(vals[0])
    eq = jnp.ones_like(vals[0])
    for w, o in zip(vals[:n_keys], partners[:n_keys]):
        lt = lt | (eq & (o < w).astype(jnp.int32))
        gt = gt | (eq & (o > w).astype(jnp.int32))
        eq = eq & (o == w).astype(jnp.int32)
    take = want_small_i * lt + (1 - want_small_i) * gt
    return [w + take * (o - w) for w, o in zip(vals, partners)]


def _merge_pair_kernel(*refs, n_arr, n_keys):
    """One cross-tile merge substage: each program owns one (lo, hi)
    partner block pair; lo keeps the elementwise key-min, hi the max.
    Block shape (1, 2, 1, R, LANES): axis 1 is the partner axis."""
    ins = [r[0, :, 0] for r in refs[:n_arr]]        # (2, R, LANES)
    lo = [x[0] for x in ins]
    hi = [x[1] for x in ins]
    swap = jnp.zeros_like(lo[0])
    eq = jnp.ones_like(lo[0])
    for a, b in zip(lo[:n_keys], hi[:n_keys]):
        swap = swap | (eq & (a > b).astype(jnp.int32))
        eq = eq & (a == b).astype(jnp.int32)
    for i in range(n_arr):
        d = swap * (hi[i] - lo[i])
        refs[n_arr + i][0, 0, 0] = lo[i] + d
        refs[n_arr + i][0, 1, 0] = hi[i] - d


def _merge_pair_pass(arrs, n_keys, s_rows, blk_rows, interpret):
    """Compare-exchange at stride ``s_rows`` ROWS (>= blk_rows) over
    [Rtot, LANES]-shaped arrays: grid over (pair groups, blocks within a
    stride), both partner blocks in VMEM per program. Pure streaming —
    one read + one write of every row."""
    n_arr = len(arrs)
    Rtot = arrs[0].shape[0]
    G, J = Rtot // (2 * s_rows), s_rows // blk_rows
    ins = [a.reshape(G, 2, J, blk_rows, LANES) for a in arrs]
    spec = pl.BlockSpec(
        (1, 2, 1, blk_rows, LANES), lambda g, j: (g, 0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        functools.partial(_merge_pair_kernel, n_arr=n_arr, n_keys=n_keys),
        grid=(G, J),
        in_specs=[spec] * n_arr,
        out_specs=[spec] * n_arr,
        out_shape=[
            jax.ShapeDtypeStruct((G, 2, J, blk_rows, LANES), jnp.int32)
        ] * n_arr,
        interpret=interpret,
    )(*ins)
    return [o.reshape(Rtot, LANES) for o in outs]


def _merge_finish_kernel(*refs, n_arr, n_keys, tile):
    """All strides < tile of an ascending bitonic merge, entirely in
    VMEM. Each block is bitonic on entry (the pair passes brought every
    element into its block) and sorted ascending on exit."""
    R = tile // LANES
    i, lane = _tile_indices(R)
    vals = [r[:] for r in refs[:n_arr]]
    m = tile.bit_length() - 1
    for j in range(m - 1, -1, -1):
        s = 1 << j
        want_small = ((i & s) == 0).astype(jnp.int32)
        if s >= LANES:
            partners = [_butterfly_rows(v, s // LANES) for v in vals]
        else:
            partners = [_butterfly_lanes(v, s, lane) for v in vals]
        vals = _cmpex_list(vals, partners, want_small, n_keys)
    for i_arr in range(n_arr):
        refs[n_arr + i_arr][:] = vals[i_arr]


def _merge_finish_pass(arrs, n_keys, tile, interpret):
    n_arr = len(arrs)
    Rtot = arrs[0].shape[0]
    R = tile // LANES
    spec = pl.BlockSpec((R, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _merge_finish_kernel, n_arr=n_arr, n_keys=n_keys, tile=tile
        ),
        grid=(Rtot // R,),
        in_specs=[spec] * n_arr,
        out_specs=[spec] * n_arr,
        out_shape=[jax.ShapeDtypeStruct((Rtot, LANES), jnp.int32)] * n_arr,
        interpret=interpret,
    )(*arrs)
    return list(outs)


# -------------------------------------------------- one-pass merge-path merge
def _lex_le_at(a_words, b_words, i, j, n_keys):
    """a[i] <= b[j] under multiword (flipped-int32) lexicographic order,
    vectorized over index vectors i, j (XLA side — tiny gathers, one per
    partition-search step)."""
    lt = jnp.zeros(i.shape, jnp.bool_)
    eq = jnp.ones(i.shape, jnp.bool_)
    for w in range(n_keys):
        x, y = a_words[w][i], b_words[w][j]
        lt = lt | (eq & (x < y))
        eq = eq & (x == y)
    return lt | eq


def _merge_partitions(fa, fb, n_keys, tile):
    """Merge-path diagonal search: for every output-tile boundary
    d = t*tile, the count i(d) of A-rows among the first d merged rows
    (ties -> A first). Returns i at boundaries 0..G (i[0]=0, i[G]=m).
    Cost: ceil(log2(m))+1 steps of G-element gathers — negligible next to
    the streaming kernel."""
    m = fa[0].shape[0]
    G = 2 * m // tile
    d = jnp.arange(1, G, dtype=jnp.int32) * tile
    lo = jnp.maximum(0, d - m)
    hi = jnp.minimum(d, m)
    for _ in range(max(1, m.bit_length())):
        live = lo < hi
        mid = (lo + hi) // 2
        # a[mid] precedes b[d-mid-1] => at least mid+1 A-rows before d.
        # While live, lo<=mid<hi<=m and 0 <= d-mid-1 <= m-1, so the clips
        # never bind; once converged, `live` freezes the interval.
        take = live & _lex_le_at(fa, fb, jnp.clip(mid, 0, m - 1),
                                 jnp.clip(d - mid - 1, 0, m - 1), n_keys)
        lo = jnp.where(take, mid + 1, lo)
        hi = jnp.where(live & ~take, mid, hi)
    zero = jnp.zeros((1,), jnp.int32)
    return jnp.concatenate([zero, lo, jnp.full((1,), m, jnp.int32)])


def _flat_window(lo_blk, hi_blk, off, R, interpret):
    """Extract the tile-row window starting at flat element offset ``off``
    (0 <= off < tile) of the two stacked blocks (each (R, LANES) in VMEM).
    Row part = dynamic sublane slice; sub-LANES residue = dynamic lane
    roll + row-carry select (arithmetic — no i1 vector selects in
    Mosaic)."""
    both = jnp.concatenate([lo_blk, hi_blk], axis=0)        # (2R, LANES)
    q = off // LANES
    r = off % LANES
    # rows q..q+R via a dynamic sublane roll + static slice (Mosaic has no
    # dynamic_slice on values; DynamicRotate exists for both axes)
    rolled = (jnp.roll(both, -q, axis=0) if interpret
              else pltpu.roll(both, 2 * R - q, 0))
    y = rolled[: R + 1]
    # roll left by r: u[i, c] = y[i, (c + r) mod LANES]
    shift = LANES - r
    u = (jnp.roll(y, shift, axis=1) if interpret
         else pltpu.roll(y, shift, 1))
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    keep_lo = (lane < (LANES - r)).astype(jnp.int32)
    return u[1:] + keep_lo * (u[:R] - u[1:])


def _reverse_deck(x, lane):
    """Full (row, lane) reversal of an (R, LANES) deck: i -> i ^ (R-1),
    l -> l ^ (LANES-1), composed from swap butterflies over every bit
    (Mosaic cannot lower `rev`; butterflies are reshapes + rolls)."""
    sr = x.shape[0] // 2
    while sr >= 1:
        x = _butterfly_rows(x, sr)
        sr //= 2
    s = LANES // 2
    while s >= 1:
        x = _butterfly_lanes(x, s, lane)
        s //= 2
    return x


def _mergepath_kernel(*refs, n_arr, n_keys, tile, interpret):
    """One output tile of the one-pass merge: windows a[i(t):i(t+1)] and
    b[j(t):j(t+1)] (la + lb = tile rows) are extracted from the four
    prefetch-selected blocks, padded with +inf keys into two ascending
    length-``tile`` decks, and merged by ONE in-VMEM bitonic merge of the
    2*tile bitonic concat [A asc | B desc]; the first ``tile`` rows (all
    the real values — pads sort last) are the tile's output."""
    offa_ref, la_ref, offb_ref = refs[2], refs[3], refs[4]
    ins = refs[5 : 5 + 4 * n_arr]
    outs = refs[5 + 4 * n_arr :]
    g = pl.program_id(0)
    R = tile // LANES
    off_a = offa_ref[g]
    off_b = offb_ref[g]
    la = la_ref[g]
    lb = tile - la
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = row * LANES + lane
    pad_a = (flat >= la).astype(jnp.int32)
    # mask for the REVERSED b deck (position p holds flat index tile-1-p,
    # padded where tile-1-p >= lb i.e. p < tile-lb): pads land at the
    # FRONT, keeping [A asc | B desc] bitonic
    pad_br = (flat < (tile - lb)).astype(jnp.int32)
    imax = jnp.int32(0x7FFFFFFF)
    keys, payloads = [], []
    for k in range(n_arr):
        wa = _flat_window(ins[4 * k][0], ins[4 * k + 1][0], off_a, R, interpret)
        wb = _flat_window(ins[4 * k + 2][0], ins[4 * k + 3][0], off_b, R, interpret)
        wbr = _reverse_deck(wb, lane)
        if k < n_keys:
            # pads to +inf in every key word (exact under wrapping)
            wa = wa + pad_a * (imax - wa)
            wbr = wbr + pad_br * (imax - wbr)
        deck = jnp.concatenate([wa, wbr], axis=0)
        (keys if k < n_keys else payloads).append(deck)
    # pad-flag tiebreak word: a REAL all-ones key equals the pad sentinel,
    # so without it pads could displace real rows (dropping their
    # payloads). As the least-significant key word it sorts pads strictly
    # last among equal keys; generated in VMEM, never written out.
    padflag = jnp.concatenate([pad_a, pad_br], axis=0)
    vals = keys + [padflag] + payloads
    i2, lane2 = _tile_indices(2 * R)
    m2 = (2 * tile).bit_length() - 1
    for j in range(m2 - 1, -1, -1):
        s = 1 << j
        want_small = ((i2 & s) == 0).astype(jnp.int32)
        if s >= LANES:
            partners = [_butterfly_rows(v, s // LANES) for v in vals]
        else:
            partners = [_butterfly_lanes(v, s, lane2) for v in vals]
        vals = _cmpex_list(vals, partners, want_small, n_keys + 1)
    merged = vals[:n_keys] + vals[n_keys + 1 :]
    for k in range(n_arr):
        outs[k][0] = merged[k][:R]


@functools.partial(jax.jit, static_argnames=("n_keys", "tile", "interpret"))
def merge_sorted_runs_onepass(a, b, n_keys, tile=1 << 13, interpret=False):
    """ONE-PASS merge of two equal-length sorted runs (merge-path).

    Same contract as :func:`merge_sorted_runs` (lists of uint32 [m]
    arrays, first ``n_keys`` are lexicographic key words, rest payloads;
    m a power of two, multiple of ``tile``), but instead of log2(m/tile)
    streaming pair passes, an XLA diagonal search finds each output
    tile's exact input windows and a single Pallas pass (scalar-prefetch
    block selection) reads each input block at most twice and writes each
    output row once — ~3 HBM passes total, independent of m.

    MEASURED (v5e, 2x2M rows, W=2 keys + payload, tile 8K): 1268 Mkeys/s
    vs merge_sorted_runs' 2883 — the multipass merge is NOT bandwidth
    bound on this size class, so trading its near-free streaming pair
    passes for 2x in-VMEM network amplification (the 2*tile deck), the
    window rolls, the deck reversal, and the pad-flag word LOSES.
    merge_sorted_runs stays the production path; this kernel is kept as
    the worked merge-path/scalar-prefetch reference (and for future
    hardware where HBM is the wall)."""
    m = a[0].shape[0]
    assert m & (m - 1) == 0 and m % tile == 0 and m >= tile, (m, tile)
    assert tile & (tile - 1) == 0 and tile >= LANES
    n_arr = len(a)
    assert len(b) == n_arr and all(x.shape[0] == m for x in a + b)
    fa = [_flip(x) if i < n_keys else jax.lax.bitcast_convert_type(x, jnp.int32)
          for i, x in enumerate(a)]
    fb = [_flip(x) if i < n_keys else jax.lax.bitcast_convert_type(x, jnp.int32)
          for i, x in enumerate(b)]
    ii = _merge_partitions(fa[:n_keys], fb[:n_keys], n_keys, tile)   # [G+1]
    G = 2 * m // tile
    GA = m // tile
    R = tile // LANES
    t = jnp.arange(G, dtype=jnp.int32)
    i0 = ii[:G]
    la = ii[1:] - i0
    j0 = t * tile - i0
    ia_blk = i0 // tile
    off_a = i0 - ia_blk * tile
    ib_blk = j0 // tile
    off_b = j0 - ib_blk * tile

    def _imap(which, hi):
        src = 0 if which == "a" else 1

        def imap(g, ia, ib, _oa, _la, _ob):
            blk = (ia if src == 0 else ib)[g]
            if hi:
                blk = jnp.minimum(blk + 1, GA - 1)
            return (blk, 0, 0)

        return imap

    blk_spec = lambda which, hi: pl.BlockSpec(  # noqa: E731
        (1, R, LANES), _imap(which, hi), memory_space=pltpu.VMEM
    )
    in_specs = []
    operands = []
    for k in range(n_arr):
        a3 = fa[k].reshape(GA, R, LANES)
        b3 = fb[k].reshape(GA, R, LANES)
        in_specs += [blk_spec("a", False), blk_spec("a", True),
                     blk_spec("b", False), blk_spec("b", True)]
        operands += [a3, a3, b3, b3]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * n_arr,
    )
    outs = pl.pallas_call(
        functools.partial(
            _mergepath_kernel, n_arr=n_arr, n_keys=n_keys, tile=tile,
            interpret=interpret,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, R, LANES), jnp.int32)] * n_arr,
        interpret=interpret,
    )(ia_blk, ib_blk, off_a, la, off_b, *operands)
    res = []
    for i, o in enumerate(outs):
        y = o.reshape(2 * m)
        res.append(_unflip(y) if i < n_keys
                   else jax.lax.bitcast_convert_type(y, jnp.uint32))
    return res


@functools.partial(jax.jit, static_argnames=("n_keys", "tile", "interpret"))
def merge_sorted_runs(a, b, n_keys, tile=1 << 13, interpret=False):
    """Merge two equal-length sorted runs into one sorted [2m] run.

    ``a`` and ``b`` are lists of uint32 arrays [m] — the first ``n_keys``
    are key words (runs sorted ascending by their lexicographic order),
    the rest are payloads riding with their rows. m must be a power of
    two >= LANES. Equal keys merge in unspecified relative order (fine
    for k-mer runs, where rows of equal keys are interchangeable).

    Cost: log2(2m) compare-exchange substages instead of a full sort's
    ~log^2 — one fused XLA pass (stride m, the reverse of b fuses into
    the minmax), log2(m/tile)+1 streaming Pallas pair passes, and one
    VMEM finish pass for every stride below the tile size."""
    m = a[0].shape[0]
    assert m & (m - 1) == 0 and m >= LANES, m
    assert all(x.shape[0] == m for x in a + b)
    n_arr = len(a)
    fa = [_flip(x) if i < n_keys else jax.lax.bitcast_convert_type(x, jnp.int32)
          for i, x in enumerate(a)]
    fb = [_flip(x) if i < n_keys else jax.lax.bitcast_convert_type(x, jnp.int32)
          for i, x in enumerate(b)]
    # stage 1 (stride m): a[i] vs b[m-1-i]; the halves [L | H] then merge
    # independently (all of L <= all of H by the bitonic 0-1 argument)
    br = [x[::-1] for x in fb]
    swap = jnp.zeros_like(fa[0])
    eq = jnp.ones_like(fa[0])
    for x, y in zip(fa[:n_keys], br[:n_keys]):
        swap = swap | (eq & (x > y).astype(jnp.int32))
        eq = eq & (x == y).astype(jnp.int32)
    arrs = []
    for x, y in zip(fa, br):
        d = swap * (y - x)
        arrs.append(jnp.concatenate([x + d, y - d]))
    tile_eff = min(tile, m)
    flat = [x.reshape(-1, LANES) for x in arrs]
    s = m // 2
    while s >= tile_eff:
        flat = _merge_pair_pass(
            flat, n_keys, s // LANES, tile_eff // LANES, interpret
        )
        s //= 2
    if tile_eff > 1:
        flat = _merge_finish_pass(flat, n_keys, tile_eff, interpret)
    out = []
    for i, x in enumerate(flat):
        y = x.reshape(2 * m)
        out.append(_unflip(y) if i < n_keys
                   else jax.lax.bitcast_convert_type(y, jnp.uint32))
    return out
