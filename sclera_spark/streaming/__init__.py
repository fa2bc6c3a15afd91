from sclera_spark.streaming.ops import (
    stream_from_directory,
    windowed_agg,
    sessionize,
    stream_match_state,
    stream_expmovavg,
    stream_dedup,
    stream_quality_filter,
    stream_enrich,
    stream_interval_join,
    run_to_memory,
    run_to_files,
    stream_to_manifest,
)

__all__ = [
    "stream_from_directory",
    "windowed_agg",
    "sessionize",
    "stream_match_state",
    "stream_expmovavg",
    "stream_dedup",
    "stream_quality_filter",
    "stream_enrich",
    "stream_interval_join",
    "run_to_memory",
    "run_to_files",
    "stream_to_manifest",
]
