"""Batch sources & sinks: typed readers (csv/json/parquet/orc/avro/
binary), partitioned writers, and the bulk CSV→Parquet loader."""
