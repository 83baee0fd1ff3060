"""Runtime warmup.

The tunneled TPU backend in this environment pays a large one-time cost
on the process's FIRST device->host transfer (measured: ~34s if done
immediately at startup, 200-350s if deferred until after heavy uploads/
compute). Paying it up front, tiny and deterministic, keeps every later
fetch at full bandwidth. No-op on CPU.
"""

import numpy as np

_done = False


def warmup_transfers() -> None:
    global _done
    if _done:
        return
    import jax
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(x)
    _done = True
