"""jit helpers.

On the axon TPU platform, eager op-by-op dispatch is extremely slow (every op
is a round-trip through the device tunnel), so parameter initialization must
run as one compiled program: always init through `jit_init`.
"""

import jax


def jit_init(model, rngs, *args, **kwargs):
    """model.init under jit.  kwargs must be hashable/static (e.g. train=True)."""

    @jax.jit
    def _init(rngs, args):
        return model.init(rngs, *args, **kwargs)

    return _init(rngs, args)


_HOST_CALLBACK_SUPPORT = None


def supports_host_callback() -> bool:
    """Whether the default backend can run jax.pure_callback inside jit.
    The axon TPU runtime cannot ("axon_pjrt does not support host send/recv
    callbacks"); CPU and standard TPU runtimes can.  Probed once per process.
    """
    global _HOST_CALLBACK_SUPPORT
    if _HOST_CALLBACK_SUPPORT is None:
        import jax.numpy as jnp
        import numpy as np

        try:
            @jax.jit
            def probe(x):
                return jax.pure_callback(
                    lambda v: np.asarray(v) + 1.0,
                    jax.ShapeDtypeStruct((), jnp.float32), x,
                )

            jax.block_until_ready(probe(jnp.zeros(())))
            _HOST_CALLBACK_SUPPORT = True
        except Exception:
            _HOST_CALLBACK_SUPPORT = False
    return _HOST_CALLBACK_SUPPORT
