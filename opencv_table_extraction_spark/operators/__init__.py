"""Training-data pipeline operators (task brief: dedup, similarity
search, text analysis, multimodal plumbing) — all Spark-first: built-in
pyspark.sql.functions / higher-order array functions on the JVM side
wherever expressible; Arrow-batched pandas UDFs only where not
(simhash bit-packing, multimodal byte decode)."""
