from mitoflex_tpu.bio import wuss


def test_hairpin_loop_components():
    fold = "<<<<___>>>>"
    seq = "GGGCAAAGCCC"
    hp = wuss.HairpinLoop(fold, wuss.seq2single(seq))
    assert hp.hairpin.to_str() == "AAA"
    assert len(hp.stem.left) == 4 and len(hp.stem.right) == 4
    comps = hp.components
    assert comps[0] is hp.stem and comps[1] is hp.hairpin


def test_multiloop_contains_hairpins():
    fold = "(((,,<<___>>,<<<____>>>,,)))"
    seq = "GGGAATTCCCAAGGGTTTTCCCAAACCC"
    ml = wuss.MultiLoop(fold, wuss.seq2single(seq))
    hps = [c for c in ml.components if isinstance(c, wuss.HairpinLoop)]
    assert len(hps) == 2
    assert hps[0].hairpin.to_str() == "CCC"
    assert hps[1].hairpin.to_str() == "TTTC"
    assert len(ml.stem.left) == 3


def test_generic_loop_trna_like():
    fold = "(((((((,,<<<<______>>>>,<<<<<_______>>>>>,,,,<<<<<_____>>>>>))))))):"
    seq = "CATTAGGTAGCTTAAATTAAAGCATTAGACTTTTAATCTAAAGATGGTGGAAAATCCACCCCTAATGA"
    g = wuss.GenericLoop(fold, wuss.seq2single(seq))
    mains = [c for c in g.components if isinstance(c, wuss.MultiLoop)]
    assert len(mains) == 1
    hps = [c for c in mains[0].components if isinstance(c, wuss.HairpinLoop)]
    assert len(hps) == 3
    center = hps[1]
    assert len(center.hairpin.sequence) == 7
    assert center.hairpin.to_str() == "CTTTTAA"


def test_align_fold_repairs_unbalanced():
    fold, seq = wuss.align_fold("<<<___>>", "GGGAAACC")
    assert fold == "<<___>>"
    assert seq == "GGAAACC"
    fold, seq = wuss.align_fold("((<<__>>)", "GGCCAAGGC")
    assert fold.count("(") == fold.count(")")


def test_deep_nesting_levels():
    fold = "[[((,<<__>>,<<__>>,)),((,<<__>>,<<__>>,))]]"
    seq = "A" * len(fold)
    g = wuss.ComplexLoop(fold, wuss.seq2single(seq))
    mls = [c for c in g.components if isinstance(c, wuss.MultiLoop)]
    assert len(mls) == 2
    for ml in mls:
        assert len([c for c in ml.components if isinstance(c, wuss.HairpinLoop)]) == 2
