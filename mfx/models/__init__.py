from mfx.models.mf import MFModel, baseline_biases, init_model
from mfx.models.svdpp import SVDppModel, init_svdpp
from mfx.models.ensemble import BlendResult, blend_as_mf, fit_blend
from mfx.models.compress import CompressResult, compress_model

__all__ = [
    "MFModel", "init_model", "baseline_biases", "SVDppModel", "init_svdpp",
    "BlendResult", "fit_blend", "blend_as_mf",
    "CompressResult", "compress_model",
]
