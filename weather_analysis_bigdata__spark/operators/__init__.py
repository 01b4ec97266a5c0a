"""Custom operators that go beyond single-expression composition:
multimodal binary processing (Arrow-batched mapInPandas) and any future
Pandas-UDF-backed operators Spark's built-ins can't express."""
