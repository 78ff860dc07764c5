from mfx.solvers import sgd

__all__ = ["sgd"]
