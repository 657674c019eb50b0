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
