from mfx.solvers import sgd, als, bpr, blocked

__all__ = ["sgd", "als", "bpr", "blocked"]
