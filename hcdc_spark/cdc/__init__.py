"""CDC dataflow: the Spark-native re-expression of the reference's
change-capture pipeline (SURVEY.md §0, §2A, §2C).

- model: the unified wide change-event schema (replaces the protobuf
  union in the reference's data_block.proto)
- statemachine: pure-Python per-file fold — one implementation shared by
  the batch and streaming reconcilers
- reconcile: batch replay of an event log → file_state table
- registry: domain/entity filter matching compiled into Catalyst
  expressions
- streaming: applyInPandasWithState reconciler + foreachBatch
  materializer
- snapshot: bootstrap & backlog catch-up
"""
