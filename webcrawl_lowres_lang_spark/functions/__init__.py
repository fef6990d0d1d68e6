"""Column-level functions: URL canonicalization/hashing, tokenization,
imaging codecs. Everything here is either a built-in pyspark.sql.functions
composition (JVM-side, codegen'd) or an Arrow-batched pandas UDF — never
row-at-a-time Python UDFs (BASELINE.json input_hint)."""
