from weather_analysis_bigdata__spark.functions.deterministic import (  # noqa: F401
    dec,
    dsum,
    davg,
    sql_dec,
    sql_dsum,
    sql_davg,
)
