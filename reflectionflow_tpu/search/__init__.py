from .state import Chains  # noqa: F401
