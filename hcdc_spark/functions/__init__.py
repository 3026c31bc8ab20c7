from hcdc_spark.functions.columns import dec, money_sum, money_avg  # noqa: F401
