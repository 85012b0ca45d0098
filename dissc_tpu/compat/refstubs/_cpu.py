"""Force jax onto CPU inside stub-hosted processes.

The container sitecustomize force-registers the tunneled TPU backend
(CLAUDE.md): JAX_PLATFORMS=cpu in the env alone is not honoured, the
config must be overridden after import.  Reference-pipeline subprocesses
must never touch the TPU tunnel (they are torch programs; only the
stubs' DSP is jax-backed).
"""


def force_cpu() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
