from .scheduler import FlowMatchSchedule, calculate_shift  # noqa: F401
