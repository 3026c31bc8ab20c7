"""Structured Streaming surface: event sources, the streaming
reconciler (stateful per-file fold), watermarked window aggregations,
and the foreachBatch materializer glue."""
