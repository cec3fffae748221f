from . import interp, planck, voigt  # noqa: F401
