"""Vectorized (pandas/Arrow) column functions and pure-Python codecs used
inside them. UDFs here are the ONLY Python that runs per-row in the engine;
everything else is built-in pyspark.sql.functions."""
