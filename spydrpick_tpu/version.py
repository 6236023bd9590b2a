"""Version info (reference: include/SpydrPick_version.h:28-30 is v1.3.0)."""

__version__ = "0.1.0"

TITLE = "spydrpick-tpu: TPU-native MI-ARACNE genome-wide co-evolution analysis"


def version_string() -> str:
    """Banner string (reference: src/SpydrPick_options.cpp:58-79)."""
    import jax

    backend = jax.default_backend()
    return f"spydrpick-tpu version {__version__} | jax {jax.__version__} | {backend} backend"
