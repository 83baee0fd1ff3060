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
    try:
        # persistent compilation cache: kernel compiles here cost 5-15s
        # each (remote compile); cache them across processes
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.float32)
    np.asarray(x)
    _done = True
