from input_data_pipeline_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_queries,
    all_oracle_sql,
    register,
)
