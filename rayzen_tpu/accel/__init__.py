from .builder import BLAS, TLAS, build_blas, build_tlas, compute_miss_links  # noqa: F401
