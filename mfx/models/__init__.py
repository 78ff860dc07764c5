from mfx.models.mf import MFModel, init_model
from mfx.models.svdpp import SVDppModel, init_svdpp

__all__ = ["MFModel", "init_model", "SVDppModel", "init_svdpp"]
