# Example mitoflex_tpu configuration file (pass with --config).
#
# The reference's config files are executable Python whose globals override
# CLI arguments (utility/parser.py:374-389); this engine keeps that
# behavior with a typed schema: define a `config` dict of sections and/or
# top-level section dicts. Unknown keys are errors, not silent no-ops.

config = {
    "run": {
        "workname": "example",
        "basedir": ".",
        "keep_temp": True,
        # "profile_dir": "/path/to/profile",
        # "taxonomy_dump": "/path/to/taxdump",
    },
    "filter": {
        "deduplication": False,
        "ns_valve": 10,
        "quality_valve": 55,
        "percentage_valve": 0.2,
        "trimming": 5,              # Gbp; 0 = no truncation
    },
    "assemble": {
        "kmer_list": [31, 39, 59, 79, 99, 119, 141],
        "depth_list": [10, 20, 20, 50, 50, 70, 70],
        "prune_level": 2,
        "prune_depth": 2,
        "insert_size": 150,
    },
    "search": {
        "min_abundance": 10,
        "required_taxa": "Arthropoda",
        "taxa_tolerance": 0,
        "merge_method": 1,
    },
    "annotate": {
        "clade": "Arthropoda",
        # "genetic_code": 5,        # default resolved from the clade
        "max_contig_length": 20000,
    },
}
