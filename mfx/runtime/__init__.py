from mfx.runtime.mesh import make_mesh, distributed_init, DATA_AXIS, MODEL_AXIS

__all__ = ["make_mesh", "distributed_init", "DATA_AXIS", "MODEL_AXIS"]
