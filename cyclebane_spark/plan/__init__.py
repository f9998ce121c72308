"""cyclebane_spark.plan"""
