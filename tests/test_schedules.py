import numpy as np

from timetuning_tpu.core.schedules import (
    cosine_annealing_lr,
    cosine_scheduler,
    schedule_at,
)


def test_cosine_scheduler_endpoints():
    s = cosine_scheduler(0.995, 1.0, 10, 100)
    assert len(s) == 1000
    assert abs(s[0] - 0.995) < 1e-9
    assert abs(s[-1] - 1.0) < 1e-5
    assert np.all(np.diff(s) >= 0)  # monotone toward final


def test_cosine_scheduler_formula():
    s = cosine_scheduler(0.04, 0.4, 2, 5)
    i = np.arange(10)
    want = 0.4 + 0.5 * (0.04 - 0.4) * (1 + np.cos(np.pi * i / 10))
    np.testing.assert_allclose(s, want)


def test_warmup():
    s = cosine_scheduler(1.0, 0.0, 10, 10, warmup_epochs=2, start_warmup_value=0.0)
    assert len(s) == 100
    assert s[0] == 0.0
    np.testing.assert_allclose(s[19], 1.0, atol=0.06)


def test_cosine_annealing_lr():
    s = cosine_annealing_lr(1e-4, 100)
    assert abs(s[0] - 1e-4) < 1e-12
    assert s[-1] < 1e-4 * 0.001 + 1e-7


def test_schedule_at_clamps():
    s = cosine_scheduler(1.0, 0.0, 1, 10)
    assert abs(float(schedule_at(s, 999)) - s[-1]) < 1e-6
    assert abs(float(schedule_at(s, 0)) - s[0]) < 1e-6
