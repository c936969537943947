"""CL metric math vs hand-computed values (Question_type.py:107-201 port)."""

import numpy as np

from vqacl_tpu.cl.metrics import ResultMatrix, evaluate_metric


def small_results():
    tasks = ["A", "B", "C"]
    res = {t: {u: 0.0 for u in tasks} for t in tasks}
    res["A"]["A"] = 50
    res["B"]["A"] = 40
    res["B"]["B"] = 60
    res["C"]["A"] = 30
    res["C"]["B"] = 55
    res["C"]["C"] = 70
    return res


def test_evaluate_metric_hand_checked():
    out = evaluate_metric(small_results(), comp_idx=[1])
    np.testing.assert_allclose(out["Incre_avg_acc"], [50, 50, 155 / 3])
    assert abs(out["Avg_acc"] - 155 / 3) < 1e-9
    np.testing.assert_allclose(out["Incre_avg_forget"], [0, 10, 12.5])
    assert out["Avg_forget"] == 12.5
    # 6Q (comp) variants restricted to task index 1
    np.testing.assert_allclose(out["Incre_avg_acc_6Q"], [-1, 60, 55])
    np.testing.assert_allclose(out["Incre_avg_forget_6Q"], [0, 10, 20])


def test_result_matrix_roundtrip():
    rm = ResultMatrix(["A", "B", "C"])
    rm.record("A", "A", 50)
    rm.record("B", "A", 40)
    rm.record("B", "B", 60)
    rm.record("C", "A", 30)
    rm.record("C", "B", 55)
    rm.record("C", "C", 70)
    out = evaluate_metric(rm.to_dict(), comp_idx=[1])
    assert abs(out["Avg_acc"] - 155 / 3) < 1e-9
    text = rm.show()
    assert "50" in text and "Avg:" in text


def test_untrained_cells_excluded():
    res = {"A": {"A": 80, "B": 0}, "B": {"A": 70, "B": 90}}
    out = evaluate_metric(res)
    np.testing.assert_allclose(out["Incre_avg_acc"], [80, 80])
    np.testing.assert_allclose(out["Incre_avg_forget"], [0, 10])
