import numpy as np

from reflectionflow_tpu.sampler.scheduler import FlowMatchSchedule, calculate_shift, time_shift


def test_calculate_shift_endpoints():
    # FLUX defaults: mu(256)=0.5, mu(4096)=1.15
    assert np.isclose(calculate_shift(256), 0.5)
    assert np.isclose(calculate_shift(4096), 1.15)


def test_schedule_monotone_terminal_zero():
    s = FlowMatchSchedule.create(30, image_seq_len=4096)
    assert s.sigmas.shape == (31,)
    assert s.sigmas[-1] == 0.0
    assert np.all(np.diff(s.sigmas) < 0)
    assert s.sigmas[0] <= 1.0
    assert s.num_steps == 30


def test_dynamic_shift_shifts_up():
    # exp(mu) > 1 pushes sigmas toward 1 (more time at high noise)
    base = np.linspace(1.0, 1.0 / 30, 30)
    shifted = time_shift(1.15, base)
    assert np.all(shifted[1:-1] > base[1:-1])


def test_deltas_sum_to_minus_first_sigma():
    s = FlowMatchSchedule.create(8, image_seq_len=1024)
    assert np.isclose(s.step_deltas().sum(), -s.sigmas[0], atol=1e-6)
