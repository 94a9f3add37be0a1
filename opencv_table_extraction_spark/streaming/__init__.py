from .incremental import (  # noqa: F401
    run_incremental,
    session_event_counts,
    windowed_event_counts,
)
from .stateful import assemble_conversations  # noqa: F401
