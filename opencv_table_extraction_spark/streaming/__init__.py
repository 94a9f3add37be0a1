from .incremental import run_incremental, windowed_event_counts  # noqa: F401
from .stateful import assemble_conversations  # noqa: F401
