"""Pure-Python row kernels. No Spark imports here — these are wrapped as
vectorized pandas UDFs in ``webcrawl_spark.functions``."""
