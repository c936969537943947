"""Official VQA normalization + consensus accuracy behavior."""

from vqacl_tpu.evaluation.vqa_acc import (
    VQAEvaluator, normalize_answer, process_digit_article,
    process_punctuation,
)


def test_normalize_digits_and_articles():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("a cat") == "cat"
    assert normalize_answer("the  None") == "0"
    assert normalize_answer("ten dogs") == "10 dogs"


def test_normalize_contractions():
    assert process_digit_article("isnt") == "isn't"
    assert process_digit_article("dont know") == "don't know"


def test_punctuation_rules():
    # punctuation adjacent to space removed entirely; otherwise → space
    assert process_punctuation("yes; no") == "yes no"
    assert process_punctuation("black/white") == "black white"
    # comma inside a number removed (commaStrip branch)
    assert process_punctuation("1,000") == "1000"
    # period stripped
    assert process_punctuation("U.S.") == "US"


def test_consensus_scoring():
    # 10 human answers: 4 say "net", 6 say "mesh"
    answers = [{"answer": "net"}] * 4 + [{"answer": "mesh"}] * 6
    gt = {1: {"answers": answers, "question_type": "what",
              "answer_type": "other"}}
    ev = VQAEvaluator(id2datum={1: {"label": {"net": 0.9}}}, id2datum_gt=gt)
    # res == net: for each of the 4 'net' gt answers, 3 other 'net's →
    # min(1,3/3)=1; for each 'mesh' gt answer, 4 matches → 1. mean = ?
    # leave-one-out: gt='net' → others contain 3 net → acc 1 (4 times);
    # gt='mesh' → others contain 4 net → acc 1 (6 times). overall 100.
    out = ev.evaluate_raw({1: "net"})
    assert out["overall"] == 100.0
    # res matches exactly 1 of 10 → leave-one-out: when gt is that one,
    # others contain 0 matches → 0; else 1/3. avg = 9 * (1/3) / 10 = 0.3
    answers2 = [{"answer": "red"}] + [{"answer": "blue"}] * 9
    ev2 = VQAEvaluator(id2datum={2: {"label": {}}},
                       id2datum_gt={2: {"answers": answers2,
                                        "question_type": "what color",
                                        "answer_type": "other"}})
    out2 = ev2.evaluate_raw({2: "red"})
    assert out2["overall"] == 30.0


def test_soft_evaluate():
    ev = VQAEvaluator(id2datum={1: {"label": {"yes": 1.0}},
                                2: {"label": {"no": 0.3}}})
    assert abs(ev.evaluate({1: "yes", 2: "no"}) - 0.65) < 1e-9
    assert abs(ev.evaluate({1: "no", 2: "maybe"})) < 1e-9
