from logshipper_spark.plans.spec import Pipeline, compile_pipeline  # noqa: F401
