"""Model zoo: CRAFT detector, CRNN recognizer, EfficientNet backbones."""

from . import craft
from . import crnn
from . import efficientnet
from .craft import CRAFT
from .crnn import CRNN


def init_variables(model, input_shape, seed: int = 0, train: bool = False):
    """Initialize a Flax model's variables as ONE compiled program.

    Eager ``model.init`` dispatches every parameter op individually —
    thousands of host->device round-trips, which costs minutes on a
    tunneled/remote TPU. Jitting the whole init collapses it into a
    single XLA program (and the zeros input never leaves the device).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _init(rng):
        return model.init(rng, jnp.zeros(input_shape), train=train)

    return _init(jax.random.PRNGKey(seed))
