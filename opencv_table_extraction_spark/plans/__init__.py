from .pipeline import (  # noqa: F401
    OUT_SCHEMA,
    extract_transcripts,
    lineage_summary,
    ordered_output,
    transcripts_from_tpch,
    turn_seq_map,
    with_turn_seq,
)
