from .catalog import SnapshotCatalog, run_resumable  # noqa: F401
