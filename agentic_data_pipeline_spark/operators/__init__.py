"""Operator modules. Importing this package registers every op (see
`agentic_data_pipeline_spark.registry`)."""
