from .checkpoint import load_variables, param_count, save_variables  # noqa: F401
