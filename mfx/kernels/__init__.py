from mfx.kernels.jnp_ref import sgd_minibatch_update

__all__ = ["sgd_minibatch_update"]
