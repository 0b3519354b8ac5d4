"""Process-level JAX configuration.

The rANS scan kernels compile slowly on TPU (minutes); a persistent
compilation cache makes every CLI/bench invocation after the first reuse
the compiled executables instead. Imported for side effects by
jxl_tpu/__init__.py. Override the location with JXL_TPU_CACHE_DIR; disable
with JXL_TPU_NO_CACHE=1.
"""

import os
import time


def ready_wait(x, interval: float = 0.002):
    """Block until a device array is ready by polling `is_ready()`.

    On the tunneled TPU, `block_until_ready`/`device_get` issued while the
    computation is still in flight hit a slow long-poll path (~100+ ms
    penalty measured), while `is_ready()` costs ~0.4 us and a device_get of
    READY data runs at the plain RTT. Polling turns every host sync into
    compute-time + epsilon. Works on any pytree; returns its input.
    """
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "is_ready")]
    for leaf in leaves:
        while not leaf.is_ready():
            time.sleep(interval)
    return x


def ready_get(x, interval: float = 0.002):
    """device_get after a ready_wait poll (fast-path transfer).

    Uses copy_to_host_async + np.asarray where available: on the tunneled
    TPU that path runs ~20 ms faster per transfer than a synchronous
    device_get issued on the same stream.
    """
    import jax
    import numpy as np

    ready_wait(x, interval)
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return jax.tree_util.tree_map(
        lambda l: np.asarray(l) if hasattr(l, "copy_to_host_async") else l, x
    )


def use_pallas() -> bool:
    """Whether Mosaic kernels can run: they need real TPU hardware; CPU
    runs (tests, harness logic) use the bit-exact XLA twins. Disable
    explicitly with JXL_TPU_NO_PALLAS=1."""
    import jax

    if os.environ.get("JXL_TPU_NO_PALLAS"):
        return False
    return jax.devices()[0].platform != "cpu"


def configure_jax() -> None:
    import jax

    # Platform override via config API: the axon TPU plugin ignores the
    # JAX_PLATFORMS env var, so JXL_TPU_PLATFORM=cpu is the reliable way to
    # run the CLI/bench off-TPU.
    platform = os.environ.get("JXL_TPU_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

    # Virtual device count for CPU mesh runs (e.g. `bench --mesh data=4`
    # off-TPU): must be set before first backend use.
    n_dev = os.environ.get("JXL_TPU_CPU_DEVICES")
    if n_dev:
        try:
            jax.config.update("jax_num_cpu_devices", int(n_dev))
        except Exception:
            pass

    if os.environ.get("JXL_TPU_NO_CACHE"):
        return

    # Partition the cache by platform override: XLA:CPU AOT artifacts carry
    # host-feature assumptions and warn loudly when loaded cross-config.
    cache_dir = os.environ.get(
        "JXL_TPU_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "jxl_tpu_jax", platform or "default"
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
