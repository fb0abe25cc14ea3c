"""Sources & sinks: synthetic transcript generation, parquet/Iceberg IO.

Reference analogue: include/gunrock/io/ (matrix_market.hxx, smtx.hxx)
loads graphs from files; our primary source is a transcripts table
(Iceberg in production, parquet here) from which the graph is derived.
"""
