from .resampling import multinomial_resample, soft_resample, systematic_resample  # noqa: F401
