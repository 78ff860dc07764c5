from mfx.models.mf import MFModel, baseline_biases, init_model
from mfx.models.svdpp import SVDppModel, init_svdpp

__all__ = ["MFModel", "init_model", "baseline_biases", "SVDppModel", "init_svdpp"]
