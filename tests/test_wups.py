"""WUPS scoring: vendored-taxonomy Wu-Palmer values, graph invariants,
backend surfacing, and the (simulated) real-WordNet path."""

import pytest

from vqacl_tpu.evaluation import taxonomy, wups


# ---------------------------------------------------------------------------
# Vendored graph invariants
# ---------------------------------------------------------------------------

def test_graph_well_formed():
    # every referenced parent is itself a node; single noun root
    roots = [s for s, ps in taxonomy.PARENTS.items() if not ps]
    assert roots == ["entity.n.01"]
    for s, ps in taxonomy.PARENTS.items():
        for p in ps:
            assert p in taxonomy.PARENTS, f"{s} -> missing parent {p}"
    # acyclic: iterative reachability to root from every node
    for s in taxonomy.PARENTS:
        seen, frontier = set(), [s]
        while frontier:
            n = frontier.pop()
            if n in seen:
                continue
            seen.add(n)
            frontier.extend(taxonomy.PARENTS[n])
            assert len(seen) < 10_000
        assert "entity.n.01" in seen, s
    # every lemma sense is encoded
    for w, senses in taxonomy.LEMMAS.items():
        for s in senses:
            assert s in taxonomy.PARENTS, f"{w}: {s} not in graph"


# ---------------------------------------------------------------------------
# Wu-Palmer values (must equal NLTK on the real corpus for these senses)
# ---------------------------------------------------------------------------

def test_wup_known_values():
    # dog.n.01 / cat.n.01 via carnivore.n.01: 2*12/(14+14)
    assert taxonomy.word_similarity("cat", "dog") == pytest.approx(24 / 28)
    # car.n.01 / truck.n.01 via motor_vehicle.n.01: 2*11/(12+12)
    assert taxonomy.word_similarity("car", "truck") == pytest.approx(22 / 24)
    # boat.n.01 / ship.n.01 via vessel.n.02: 2*10/(11+11)
    assert taxonomy.word_similarity("boat", "ship") == pytest.approx(20 / 22)
    # synonym lemmas share a synset
    assert taxonomy.word_similarity("car", "automobile") == 1.0
    assert taxonomy.word_similarity("couch", "sofa") == 1.0
    # multi-sense lemma: bike matches both bicycle and motorcycle
    assert taxonomy.word_similarity("bike", "motorcycle") == 1.0
    assert taxonomy.word_similarity("bike", "bicycle") == 1.0
    # cross-domain similarity is low but nonzero
    sim = taxonomy.word_similarity("dog", "car")
    assert 0.0 < sim < 0.5
    # out-of-vocabulary → None (caller falls back)
    assert taxonomy.word_similarity("dog", "zzyzx") is None


def test_similarity_symmetry_and_bounds():
    words = ["cat", "dog", "horse", "car", "boat", "man", "woman", "baby",
             "ball", "water", "kitchen", "play"]
    for a in words:
        for b in words:
            s = taxonomy.word_similarity(a, b)
            assert s is not None and 0.0 <= s <= 1.0
            assert s == taxonomy.word_similarity(b, a)
            if a == b:
                # NLTK quirk reproduced faithfully: self-similarity can be
                # <1 under multiple inheritance (use_min_depth LCS ranking
                # can prefer a parent over the synset itself — e.g.
                # dog.n.01 → canine, 26/28). get_wups shields callers with
                # the canonical a==b → 1.0 word-level shortcut.
                assert s >= 0.9


def test_self_similarity_nltk_quirk():
    # dog.n.01 has two hypernym paths (canine / domestic_animal); the
    # min-depth LCS rule picks canine → 2*13/(14+14)
    assert taxonomy.wup("dog.n.01", "dog.n.01") == pytest.approx(26 / 28)
    # single-parent synsets self-score 1.0
    assert taxonomy.wup("cat.n.01", "cat.n.01") == 1.0
    # word level is always shielded
    assert wups.word_similarity("dog", "dog") == 1.0


# ---------------------------------------------------------------------------
# get_wups end-to-end (vendored backend — no corpus in this environment)
# ---------------------------------------------------------------------------

def test_get_wups_vendored_backend():
    assert not wups.wordnet_available()
    assert wups.wups_backend() == "vendored-taxonomy"
    # the VERDICT acceptance check: a real Wu-Palmer value in CI, not 0
    assert wups.get_wups("cat", "dog") == pytest.approx(24 / 28)
    assert wups.get_wups("dog", "dog") == 1.0
    # multi-token: product over per-token best matches, min of two sides
    v = wups.get_wups("baby dog", "baby cat")
    assert v == pytest.approx(1.0 * 24 / 28)
    # OOV pair inside a phrase degrades to exact for that pair only
    assert wups.get_wups("zzyzx", "zzyzx") == 1.0
    assert wups.get_wups("zzyzx", "qqqqq") == 0.0


def test_get_wups_nltk_path(monkeypatch):
    """Drive the real-WordNet branch with a stub corpus object."""
    class FakeSynset:
        def __init__(self, v):
            self.v = v

        def wup_similarity(self, other):
            return max(self.v, other.v)

    class FakeWN:
        def synsets(self, w):
            return [FakeSynset(0.75 if w == "cat" else 0.25)]

    monkeypatch.setattr(wups, "_WN", FakeWN())
    monkeypatch.setattr(wups, "_WN_CHECKED", True)
    wups.word_similarity.cache_clear()
    try:
        assert wups.wordnet_available()
        assert wups.wups_backend() == "nltk-wordnet"
        assert wups.word_similarity("cat", "mouse") == 0.75
    finally:
        wups.word_similarity.cache_clear()


def test_evaluator_surfaces_backend():
    from vqacl_tpu.nextqa.data import NextQAEvaluator
    ev = NextQAEvaluator({"q0": {"gt_answer": "dog", "type": "CW",
                                 "qid": "q0", "video": "v0"}})
    out = ev.evaluate_raw({"q0": "cat"})
    assert out["wups_backend"] == "vendored-taxonomy"
    assert out["overall"] == pytest.approx(100 * 24 / 28)
    assert out["wups_vocab_coverage"] == 1.0   # cat/dog both in vocab


def test_evaluator_reports_vocab_coverage():
    """OOV word pairs degrade to exact match — the evaluator must report
    what fraction of scored pairs actually resolved (VERDICT r2 #5)."""
    from vqacl_tpu.nextqa.data import NextQAEvaluator
    ev = NextQAEvaluator({
        "q0": {"gt_answer": "dog", "type": "CW", "qid": "q0", "video": "v"},
        "q1": {"gt_answer": "zyzzyva", "type": "CW", "qid": "q1",
               "video": "v"},                    # OOV ground truth
        "q2": {"gt_answer": "frisbee", "type": "CC", "qid": "q2",
               "video": "v"},                    # CC = exact path, no WUPS
    })
    out = ev.evaluate_raw({"q0": "cat", "q1": "insect", "q2": "frisbee"})
    # 2 WUPS-scored pairs: (cat,dog) covered, (insect,zyzzyva) not
    assert out["wups_vocab_coverage"] == pytest.approx(0.5)

    # widened vocabulary resolves typical NExT-QA answers to real WUPS
    from vqacl_tpu.evaluation import wups
    assert wups.word_similarity("river", "lake") == pytest.approx(0.8)
    assert wups.word_similarity("eating", "drinking") > 0.8
    assert wups.word_in_vocab("skateboard")
    assert not wups.word_in_vocab("zyzzyva")
