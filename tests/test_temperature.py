"""Gumbel temperature scheduler (reference distributions/gumbel.py:21-41)."""
import numpy as np

from rqvae_tpu.train.temperature import ConstantTemperature, TemperatureScheduler


def test_constant():
    s = ConstantTemperature(0.2)
    assert [s.get_t(i) for i in (0, 500, 10**6)] == [0.2, 0.2, 0.2]


def test_anneal_steps_only_at_window_end():
    s = TemperatureScheduler(t0=1.0, min_t=0.1, anneal_rate=1e-3, step_size=10)
    ts = [s.get_t(i) for i in range(25)]
    # constant within a window, decays at iters 9 and 19
    assert ts[0] == ts[8] == 1.0
    assert ts[9] == ts[18] < 1.0
    assert ts[19] < ts[9]
    np.testing.assert_allclose(ts[9], 1.0 * np.exp(-1e-3 * 9))


def test_anneal_floor():
    s = TemperatureScheduler(t0=1.0, min_t=0.5, anneal_rate=1.0, step_size=1)
    for i in range(10):
        t = s.get_t(i)
    assert t == 0.5


def test_constant_t_chunk_bound_never_straddles_an_anneal():
    """Device-loop chunks sample t once; every iter in [it_start,
    it_start+bound-1] must share get_t, and the bound must be maximal
    (the next iter changes t while above the floor)."""
    from rqvae_tpu.train.temperature import constant_t_chunk_bound

    s = TemperatureScheduler(t0=1.0, min_t=1e-9, anneal_rate=1e-4, step_size=10)
    for it_start in range(0, 35):
        n = constant_t_chunk_bound(it_start, s.step_size)
        assert 1 <= n <= s.step_size
        ts = {s.get_t(i) for i in range(it_start, it_start + n)}
        assert len(ts) == 1, (it_start, n)
        assert s.get_t(it_start + n) != s.get_t(it_start), (it_start, n)
