import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.eval.vos import (
    boundary_f_measure,
    boundary_map,
    db_statistics,
    evaluate_sequence,
    j_and_f,
    region_iou,
)


def square_mask(h=32, w=32, y0=8, y1=24, x0=8, x1=24):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_boundary_map_square():
    b = np.asarray(boundary_map(jnp.asarray(square_mask())))
    # boundary of a filled square is a ring: interior not boundary
    assert b[8, 8] or b[7, 8] or b[8, 7]  # near the corner
    assert not b[16, 16]
    assert b.sum() < square_mask().sum()


def test_f_perfect_and_degraded():
    m = square_mask()
    assert float(boundary_f_measure(jnp.asarray(m), jnp.asarray(m))) == pytest.approx(1.0)
    shifted = np.roll(m, 2, axis=1)
    f_near = float(boundary_f_measure(jnp.asarray(shifted), jnp.asarray(m)))
    far = np.roll(m, 12, axis=1)
    f_far = float(boundary_f_measure(jnp.asarray(far), jnp.asarray(m)))
    assert f_near > f_far


def test_f_empty_cases():
    z = jnp.zeros((16, 16), bool)
    m = jnp.asarray(square_mask(16, 16, 4, 12, 4, 12))
    assert float(boundary_f_measure(z, z)) == pytest.approx(1.0)
    assert float(boundary_f_measure(m, z)) == pytest.approx(0.0)
    assert float(boundary_f_measure(z, m)) == pytest.approx(0.0)


def test_region_iou():
    m = jnp.asarray(square_mask())
    assert float(region_iou(m, m)) == pytest.approx(1.0)
    assert float(region_iou(jnp.zeros((4, 4)), jnp.zeros((4, 4)))) == 1.0
    half = square_mask(32, 32, 8, 24, 8, 16)
    got = float(region_iou(jnp.asarray(half), m))
    assert got == pytest.approx(0.5, abs=0.05)


def test_evaluate_sequence_and_aggregate():
    gt = np.zeros((3, 32, 32), int)
    gt[:, 8:24, 8:24] = 1
    gt[:, 2:6, 2:6] = 2
    res = evaluate_sequence(gt, gt)
    assert set(res.keys()) == {1, 2}
    agg = j_and_f([res])
    assert agg["J&F"] == pytest.approx(1.0)


def test_db_statistics():
    j = np.array([1.0, 0.9, 0.6, 0.4, 0.2, 0.1, 0.0, 0.0])
    M, O, D = db_statistics(j)
    assert M == pytest.approx(j.mean())
    assert O == pytest.approx(np.mean(j > 0.5))
    assert D > 0  # decaying sequence has positive decay


def test_boundary_map_matches_reference_seg2bmap():
    """Pin the EXACT reference _seg2bmap semantics
    (mask_propagation.py:614-627): E/S/SE XOR with zero padding, last
    row/col overridden to single-direction diffs, corner zeroed."""
    rng = np.random.default_rng(0)

    def ref_seg2bmap(seg):
        seg = seg.astype(bool)
        e = np.zeros_like(seg); s = np.zeros_like(seg); se = np.zeros_like(seg)
        e[:, :-1] = seg[:, 1:]
        s[:-1, :] = seg[1:, :]
        se[:-1, :-1] = seg[1:, 1:]
        b = seg ^ e | seg ^ s | seg ^ se
        b[-1, :] = seg[-1, :] ^ e[-1, :]
        b[:, -1] = seg[:, -1] ^ s[:, -1]
        b[-1, -1] = 0
        return b

    from timetuning_tpu.eval.vos import boundary_map

    cases = [rng.random((13, 17)) > 0.5 for _ in range(4)]
    cases.append(np.ones((9, 9), bool))   # full-frame mask: ~no boundary
    cases.append(np.zeros((9, 9), bool))
    for m in cases:
        np.testing.assert_array_equal(
            np.asarray(boundary_map(jnp.asarray(m))), ref_seg2bmap(m)
        )
    # full-frame: reference counts only the last row/col single-diffs (0)
    assert np.asarray(boundary_map(jnp.asarray(np.ones((9, 9))))).sum() == 0
