from .incremental import run_incremental  # noqa: F401
