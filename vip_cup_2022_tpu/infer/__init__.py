from .engine import NAME2BS, EnsembleEngine, load_manifest, registry_name  # noqa: F401
