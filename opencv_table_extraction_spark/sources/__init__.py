from .catalog import (  # noqa: F401
    IcebergSnapshotCatalog,
    SnapshotCatalog,
    has_iceberg_runtime,
    run_resumable,
)
