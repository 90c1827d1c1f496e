from .dit import flux_dit_apply, flux_dit_init  # noqa: F401
