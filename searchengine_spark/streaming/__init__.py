from searchengine_spark.streaming.incremental import (  # noqa: F401
    sessionize_events,
    stage_corpus_stream,
    stream_corpus,
    windowed_event_counts,
)
