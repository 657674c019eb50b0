"""Device mesh and sharded pipeline steps.

The reference is single-node: its concurrency is process pools and thread
flags (SURVEY.md §2 parallelism table). The TPU engine's scale-out is pure
data parallelism over reads/contigs/windows on a ``jax.sharding.Mesh``
(axis "data"), with profile tables replicated; cross-chip merges ride XLA
collectives over ICI:

- read filtering: batch sharded on axis 0, no communication;
- k-mer counting: each device sort-counts its shard, then sorted runs are
  merged with an ``all_gather`` + re-sort (a distributed histogram merge —
  the psum analog for sparse keys);
- profile-HMM scanning: windows sharded on axis 0, profiles replicated.

Multi-host runs initialize jax.distributed outside and pass the global
mesh; everything here is expressed with ``shard_map`` so it compiles the
same for 1 chip, 1 host, or N hosts.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import filter as filter_ops
from ..ops import kmer as kmer_ops
from ..ops import phmm as phmm_ops
from ..ops import sw as sw_ops


def make_mesh(
    shape: Optional[Sequence[int]] = None, axes: Sequence[str] = ("data",)
) -> Mesh:
    devices = np.array(jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    return Mesh(devices[:n].reshape(tuple(shape)), tuple(axes))


def shard_batch(mesh: Mesh, *arrays: jax.Array) -> Tuple[jax.Array, ...]:
    """Place arrays with axis 0 sharded over the data axis."""
    out = []
    for a in arrays:
        spec = P("data", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


@functools.partial(
    jax.jit, static_argnames=("ns_valve", "quality_valve", "percentage_valve", "mesh")
)
def filter_reads_sharded(
    mesh: Mesh,
    seqs: jax.Array,
    quals: jax.Array,
    lengths: jax.Array,
    ns_valve: int = 10,
    quality_valve: int = 55,
    percentage_valve: float = 0.2,
    cutoff_lengths: jax.Array | None = None,
):
    """Data-parallel read filter: embarrassingly parallel over reads."""
    if cutoff_lengths is None:
        cutoff_lengths = lengths

    def local(s, q, l, cl):
        return filter_ops.filter_reads_ref(
            s, q, l, ns_valve, quality_valve, percentage_valve, cl
        )

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
    )(seqs, quals, lengths, cutoff_lengths)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def count_kmers_sharded(
    mesh: Mesh, seqs: jax.Array, lengths: jax.Array, k: int
):
    """Distributed k-mer histogram: local sort-count per device shard, then
    an all_gather of the sorted runs and a weighted re-count so every
    device holds the merged (keys, counts) table.

    Returns (words list [N_total] x W, counts [N_total], n_unique) fully
    replicated — the multi-chip analog of the host-side
    merge_sorted_counts."""

    def local(s, l):
        words, valid = kmer_ops.extract_kmers(s, l, k)
        rc = kmer_ops.revcomp_codes(s, l)
        words_r, valid_r = kmer_ops.extract_kmers(rc, l, k)
        cat = [jnp.concatenate([a, b]) for a, b in zip(words, words_r)]
        cat_v = jnp.concatenate([valid, valid_r])
        uw, uc, _ = kmer_ops.sort_count_unique(cat, cat_v)
        # gather every device's sorted run, then merge by re-counting with
        # the counts as weights
        gw = [jax.lax.all_gather(w, "data", tiled=True) for w in uw]
        gc = jax.lax.all_gather(uc, "data", tiled=True)
        mw, mc, mn = kmer_ops.sort_count_unique(
            gw, gc > 0, weights=gc
        )
        return (*mw, mc, mn)

    outs = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=(*([P(None)] * kmer_ops.num_words(k)), P(None), P()),
        # outputs are replicated by construction (post-all_gather), which
        # the varying-mesh-axes check cannot always infer
        check_vma=False,
    )(seqs, lengths)
    W = kmer_ops.num_words(k)
    return list(outs[:W]), outs[W], outs[W + 1]


@functools.partial(jax.jit, static_argnames=("model_len", "mesh"))
def viterbi_scan_sharded(
    mesh: Mesh,
    prof: phmm_ops.DeviceProfile,
    seqs: jax.Array,
    lengths: jax.Array,
    model_len: int,
):
    """Profile replicated, windows sharded."""

    def local(s, l):
        return phmm_ops.viterbi_scan(prof, s, l, model_len)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=phmm_ops.HmmHits(P("data"), P("data"), P("data"), P("data"), P("data")),
        # the scan carry mixes device-varying (per-shard windows) and
        # replicated (profile) values; skip the inference check
        check_vma=False,
    )(seqs, lengths)


@functools.partial(jax.jit, static_argnames=("gap_open", "gap_extend", "mesh"))
def sw_align_sharded(
    mesh: Mesh,
    queries: jax.Array,
    q_lens: jax.Array,
    targets: jax.Array,
    t_lens: jax.Array,
    submat: jax.Array,
    gap_open: float = 11.0,
    gap_extend: float = 1.0,
) -> sw_ops.SwHits:
    """Annotation-stage alignment fan-out: the reference shards its
    tblastn/blastn query DB across a multiprocessing.Pool
    (annotation_tookit.py:74-97); here (query, target) pairs shard over
    the data axis with the substitution matrix replicated — the same
    kernel that scores blast hits, genewise windows and remaps reads."""

    def local(q, ql, t, tl, sm):
        return sw_ops.sw_align(q, ql, t, tl, sm, gap_open, gap_extend)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(
            P("data", None), P("data"), P("data", None), P("data"),
            P(None, None),
        ),
        out_specs=sw_ops.SwHits(*([P("data")] * len(sw_ops.SwHits._fields))),
        # the scan carry mixes device-varying rows with the replicated
        # substitution matrix; skip the varying-axes inference check
        check_vma=False,
    )(queries, q_lens, targets, t_lens, submat)


def pipeline_step(
    mesh: Mesh,
    seqs: jax.Array,
    quals: jax.Array,
    lengths: jax.Array,
    prof: phmm_ops.DeviceProfile,
    model_len: int,
    k: int = 21,
):
    """One fused device step of the production pipeline over a mesh:
    filter -> count k-mers of surviving reads -> profile scan. Used by the
    multi-chip dry run and as the unit the benchmark scales over."""
    keep, h1, h2 = filter_reads_sharded(mesh, seqs, quals, lengths)
    lengths_f = jnp.where(keep, lengths, 0)
    words, counts, n_unique = count_kmers_sharded(mesh, seqs, lengths_f, k)
    hits = viterbi_scan_sharded(mesh, prof, seqs, lengths_f, model_len)
    return dict(
        kept=jnp.sum(keep.astype(jnp.int32)),
        n_unique_kmers=n_unique,
        max_count=jnp.max(counts),
        best_score=jnp.max(hits.score),
    )
