"""Sources & sinks (SURVEY §2.1): partitioned bronze IO + incremental
checkpointing."""
