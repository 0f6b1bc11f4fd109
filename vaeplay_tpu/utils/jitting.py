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
