from .incremental import run_incremental  # noqa: F401
from .stateful import assemble_conversations  # noqa: F401
