"""cyclebane_spark.functions"""
