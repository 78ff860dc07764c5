from mfx.solvers import sgd, svdpp, als, nmf, ials, bpr, blocked

__all__ = ["sgd", "svdpp", "als", "nmf", "ials", "bpr", "blocked"]
