from mfx.solvers import sgd, als, ials, bpr, blocked

__all__ = ["sgd", "als", "ials", "bpr", "blocked"]
